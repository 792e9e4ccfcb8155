"""The skew-audit layout builder must produce what SCALE.md claims it
times: ~30% of every fact table's rows on ONE hot key (key 0), all other
tables byte-identical, and the same physical row counts — otherwise the
"measured skew absorption" table is measuring a layout nobody specified.
Pure pyarrow (no Spark): validates tools/skew_audit.build_skew against a
temp copy of sf0.001."""

from __future__ import annotations

import pathlib
import shutil

import pyarrow.compute as pc
import pytest
import pyarrow.parquet as pq

from tools.skew_audit import HOT_FRAC, _SKEWED_KEYS, build_skew

SRC = pathlib.Path("/root/testdata/sf0.001")


def test_build_skew_hot_fraction_and_fidelity(tmp_path):
    base = tmp_path / "base"
    base.mkdir()
    for f in SRC.glob("*.parquet"):
        shutil.copy(f, base / f.name)
    out = build_skew(str(base), str(tmp_path / "skewed"))

    for name, key in _SKEWED_KEYS.items():
        orig = pq.read_table(base / f"{name}.parquet")
        skew = pq.read_table(pathlib.Path(out) / f"{name}.parquet")
        assert skew.num_rows == orig.num_rows, name
        assert skew.schema.equals(orig.schema), name
        hot = pc.sum(pc.equal(skew.column(key), 0).cast("int64")).as_py()
        frac = hot / skew.num_rows
        # retargeted rows plus whatever already sat on key 0
        assert HOT_FRAC <= frac <= HOT_FRAC + 0.05, (name, frac)
        # non-key columns untouched (same multiset; rows are not reordered)
        for field in orig.schema:
            if field.name != key:
                assert skew.column(field.name).equals(orig.column(field.name)), (
                    name,
                    field.name,
                )

    # every non-fact table is byte-identical content
    for f in base.glob("*.parquet"):
        name = f.stem
        if name in _SKEWED_KEYS:
            continue
        assert pq.read_table(f).equals(
            pq.read_table(pathlib.Path(out) / f.name)
        ), name


def test_build_skew_idempotent(tmp_path):
    base = tmp_path / "base"
    base.mkdir()
    for f in SRC.glob("*.parquet"):
        shutil.copy(f, base / f.name)
    out = build_skew(str(base), str(tmp_path / "skewed"))
    t1 = pq.read_table(pathlib.Path(out) / "lineitem.parquet")
    out2 = build_skew(str(base), str(tmp_path / "skewed"))  # no rebuild
    assert out2 == out
    assert pq.read_table(pathlib.Path(out2) / "lineitem.parquet").equals(t1)


def test_longdocs_genscheme_marker(tmp_path, monkeypatch):
    """ensure_longdocs (r13): a tier is valid only when its _GENSCHEME
    marker matches the current generation scheme.  A stale marker on ANY
    tier regenerates ALL tiers (a cached older-scheme tier next to a
    newer one breaks the tier-prefix invariant the exponent fits rest
    on), while a merely-missing tier is filled in without touching the
    others (per-doc seeding makes nesting hold across extensions)."""
    import os

    import tools.make_longdocs as m

    monkeypatch.setattr(m, "TIERS", (1, 2))
    monkeypatch.setattr(m, "_BASE_DOCS", 8)
    out = tmp_path / "longdocs"
    tiers = m.ensure_longdocs(str(out))
    assert [t for _, t in tiers] == [1.0, 2.0]
    x1, x2 = (pathlib.Path(d) for d, _ in tiers)
    for d in (x1, x2):
        assert (d / "documents.parquet").exists()
        assert (d / m._MARKER).read_text().strip() == m._scheme("longdocs")

    # cache hit: nothing rewritten
    stamps = {d: os.stat(d / "documents.parquet").st_mtime_ns for d in (x1, x2)}
    m.ensure_longdocs(str(out))
    assert {d: os.stat(d / "documents.parquet").st_mtime_ns for d in (x1, x2)} == stamps

    # stale marker on ONE tier -> ALL tiers regenerate, markers restored
    (x1 / m._MARKER).write_text("perdoc-v0:stale\n")
    m.ensure_longdocs(str(out))
    assert (x1 / m._MARKER).read_text().strip() == m._scheme("longdocs")
    new_stamps = {d: os.stat(d / "documents.parquet").st_mtime_ns for d in (x1, x2)}
    assert new_stamps[x1] != stamps[x1] and new_stamps[x2] != stamps[x2]

    # missing tier is filled in alone; nesting holds
    shutil.rmtree(x2)
    m.ensure_longdocs(str(out))
    assert os.stat(x1 / "documents.parquet").st_mtime_ns == new_stamps[x1]
    t1 = pq.read_table(x1 / "documents.parquet")
    t2 = pq.read_table(x2 / "documents.parquet")
    assert t2.slice(0, t1.num_rows).equals(t1)


def test_corpus_shapes_are_distinct_and_nested(tmp_path, monkeypatch):
    """ensure_docs (r15): named corpus shapes generate from disjoint
    per-shape seeds/parameters (shortdocs must exercise a genuinely
    different df-distribution than longdocs — shorter docs, flatter
    vocabulary), each shape carries its own marker, and tier nesting
    holds within a shape."""
    import numpy as np

    import tools.make_longdocs as m

    monkeypatch.setattr(m, "TIERS", (1, 2))
    monkeypatch.setattr(m, "_BASE_DOCS", 64)
    long_tiers = m.ensure_docs("longdocs", str(tmp_path / "longdocs"))
    short_tiers = m.ensure_docs("shortdocs", str(tmp_path / "shortdocs"))

    lt = pq.read_table(pathlib.Path(long_tiers[0][0]) / "documents.parquet")
    st = pq.read_table(pathlib.Path(short_tiers[0][0]) / "documents.parquet")
    assert lt.num_rows == st.num_rows == 64
    l_texts, s_texts = lt.column("text").to_pylist(), st.column("text").to_pylist()
    assert l_texts != s_texts  # disjoint seeds -> different corpora
    # shortdocs median length well under longdocs median
    l_med = np.median([len(t.split()) for t in l_texts])
    s_med = np.median([len(t.split()) for t in s_texts])
    assert s_med < l_med / 2
    # per-shape markers differ and match their scheme strings
    l_marker = (pathlib.Path(long_tiers[0][0]) / m._MARKER).read_text().strip()
    s_marker = (pathlib.Path(short_tiers[0][0]) / m._MARKER).read_text().strip()
    # _scheme() is dynamic (it folds the monkeypatched _BASE_DOCS into the
    # marker — a changed base regenerates, which is the point); the
    # module-level GEN_SCHEME export reflects the unpatched defaults.
    assert l_marker == m._scheme("longdocs")
    assert s_marker == m._scheme("shortdocs") != l_marker
    # nesting holds within the shortdocs shape
    s2 = pq.read_table(pathlib.Path(short_tiers[1][0]) / "documents.parquet")
    assert s2.slice(0, st.num_rows).equals(st)
    with pytest.raises(KeyError):
        m.ensure_docs("nosuchshape", str(tmp_path / "x"))


def test_vector_tiers_nested_and_schema(tmp_path, monkeypatch):
    """ensure_vectors (r15): tier nesting holds, the marker protocol
    regenerates on parameter change, planted dups land where the scheme
    says, and the schema matches the shipped embeddings table exactly
    (so catalog.load(tier_dir, 'embeddings') feeds every sim* query)."""
    import numpy as np

    import tools.make_vectors as mv

    monkeypatch.setattr(mv, "TIERS", (1, 2))
    monkeypatch.setattr(mv, "_BASE_VECS", 128)
    tiers = mv.ensure_vectors(str(tmp_path / "vectors"))
    t1 = pq.read_table(pathlib.Path(tiers[0][0]) / "embeddings.parquet")
    t2 = pq.read_table(pathlib.Path(tiers[1][0]) / "embeddings.parquet")
    assert t1.num_rows == 128 and t2.num_rows == 256
    assert t2.slice(0, 128).equals(t1)  # nesting
    assert [f.name for f in t1.schema] == ["vec_id", "embedding", "label"]
    assert str(t1.schema.field("embedding").type) == "list<element: float>"
    assert str(t1.schema.field("label").type) == "int32"
    emb = np.array(t2.column("embedding").to_pylist(), dtype=np.float32)
    labs = t2.column("label").to_numpy()
    # exact dup: i % 100 == 99 copies i-30 (vector AND label)
    assert np.array_equal(emb[199], emb[169]) and labs[199] == labs[169]
    # near dup: i % 50 == 25 is a tiny perturbation of i-20, same label
    d_near = float(np.abs(emb[225] - emb[205]).max())
    assert 0 < d_near < 0.2 and labs[225] == labs[205]
    # stale marker regenerates
    marker = pathlib.Path(tiers[0][0]) / mv._MARKER
    assert marker.read_text().strip() == mv._scheme()
    marker.write_text("pervec-v0:stale\n")
    import os

    stamp = os.stat(pathlib.Path(tiers[1][0]) / "embeddings.parquet").st_mtime_ns
    mv.ensure_vectors(str(tmp_path / "vectors"))
    assert marker.read_text().strip() == mv._scheme()
    assert os.stat(pathlib.Path(tiers[1][0]) / "embeddings.parquet").st_mtime_ns != stamp
