"""Measured-skew timing gate (r8 verdict ask #5).

SCALE.md's hot-key story — AQE skew-join splits for the plain joins,
explicit salting for sj01, map-side partial aggregation for the
groupwise operators, per-user windows whose hot partition costs sort
time but not memory — was argued from plan shape, never timed.  This
tool times it: it synthesizes a SKEWED variant of a tier in which 30%
of every fact table's rows land on ONE hot key (lineitem.l_orderkey,
orders.o_custkey, events.user_id — all retargeted to key 0, which
exists in every tier, so referential joins still hit), then runs the
skew-sensitive queries on the uniform and skewed layouts back-to-back
and asserts the skewed run stays within ``MULTIPLE``× of uniform.

A hot key that a plan absorbs (salting, AQE split, partial agg) costs
roughly its share of extra rows — well under 3×.  A hot key that a plan
does NOT absorb serializes ~30% of the data onto one task on a 32-way
box: wall-clock blows past the gate, exit 1.  That is precisely the
failure a 1000-executor/100 TB deployment cannot tolerate (one straggler
task holding a 2 TB partition).

Queries under the gate (the ask's list):
  * sj01_salted_join_agg  — explicit 8-way salted fact⋈dim join
  * j01_inner_join_agg    — plain orders⋈lineitem equi-join (AQE skew split)
  * q05_groupwise_max     — agg + self equi-join on the hot group key
  * q05_groupwise_max_window — rank() window partitioned by the hot key
  * ses01_gap_sessions    — per-user lag + running-sum windows

Layouts are timed with SPARK_GRAFT_NO_COMPACT=1 so both read the same
physical file shapes (the compaction cache would give whichever layout
ran first a different file count).  REPS runs per (query, layout), min
taken, after one untimed warmup per layout.

Default tier is the local sf1 (tools/make_sf1.py; ~6M lineitem rows,
where the hot key holds ~1.8M rows and a serialized straggler is
measurable); ``--tier sf0.1`` audits the shipped tier instead.

Usage: python tools/skew_audit.py [--json] [--tier sf1|sf0.1] [query ...]
       python tools/skew_audit.py --text [--json] [query ...]
Exit 0 = every audited query within MULTIPLE x of its uniform time.

``--text`` (r12, r11 verdict ask #4) gates the TEXT-SURFACE skew the
join audit cannot see: hot shingles, not hot join keys.  Base layout is
the longdocs x4 tier (tools/make_longdocs.py); two planted twins:

  * ``hotshingle`` — 30% of the ≥60-token docs get the SAME 8-token
    boilerplate footer: one shingle family lands in ~30% of documents
    (the web-footer shape).  The footer is far below both pair
    thresholds (J ≈ 0.01 < 0.02, containment ≤ 0.1 < 0.3), so the TRUE
    output is unchanged — any slowdown in dd04/dd18/dd21/dd22 is pure
    candidate-generation waste on the hot shingle, which the df-ranked
    prefixes are supposed to shed.
  * ``hotband`` — 30% of docs become one 60-token boilerplate plus a
    3-token unique tail: ~92% of their minhash seeds draw from the
    boilerplate, so whole LSH bands collide and every band gets a
    ~900-doc hot bucket — the star-pairing cap's worst case, gated on
    dd03 (pair emission must stay linear in bucket width, not W²/2).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPS = 3
MULTIPLE = 3.0  # skewed wall-clock must stay within this factor of uniform
HOT_FRAC = 0.30
SEED = 422

# fact table -> key column retargeted onto the hot key (always key 0)
_SKEWED_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_custkey",
    "events": "user_id",
}

AUDITED = [
    "sj01_salted_join_agg",
    "j01_inner_join_agg",
    "q05_groupwise_max",
    "q05_groupwise_max_window",
    "ses01_gap_sessions",
]

# --text mode: query -> planted layout it is gated on.  dd22 (r13) is
# gated on hotshingle, NOT hotband: the hotband plant makes 30% of docs
# mutual near-dups (J ≈ 0.91 ≥ its τ = 0.5), so a LOSSLESS pair operator
# must emit the ~W²/2 true pairs there — wall-clock would measure
# workload, not waste, and the 3× gate would be meaningless.  hotband
# gates the CAPPED candidate generator (dd03); the lossless operators'
# boilerplate hazard is the hotshingle leg, where the true output is
# unchanged by construction.
TEXT_AUDITED = {
    "dd04_jaccard_pairs": "hotshingle",
    "dd18_containment_pairs": "hotshingle",
    "dd21_lsh_band_eval": "hotshingle",
    "dd22_jaccard_pairs_strict": "hotshingle",
    "dd03_lsh_candidate_pairs": "hotband",
}

_FOOTER = " ".join(f"footer{i}" for i in range(8))
_BOILER = " ".join(f"boiler{i}" for i in range(60))
_MIN_FOOTER_TOKENS = 60  # only long docs get the footer (keeps output flat)

_LOCALDATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)


def _skew_table(src_path: str, key: str, rng: np.random.Generator) -> pa.Table:
    tbl = pq.read_table(src_path)
    n = tbl.num_rows
    mask = np.zeros(n, dtype=bool)
    mask[rng.choice(n, size=int(n * HOT_FRAC), replace=False)] = True
    col = tbl.column(key)
    field = tbl.schema.field(key)
    hot = pa.scalar(0, type=field.type)
    patched = pc.if_else(pa.array(mask), hot, col.combine_chunks())
    return tbl.set_column(tbl.schema.get_field_index(key), field, patched)


def _skew_scheme(base_dir: str) -> str:
    """Cache-validation string for a skewed twin (r13): its own plant
    params plus the base tier's generation marker when one exists, so a
    regenerated base (e.g. sf1 under a new scheme) invalidates the twin."""
    try:
        with open(os.path.join(base_dir, "_GENSCHEME")) as f:
            base = f.read().strip()
    except OSError:
        base = "shipped"
    return f"skew-v1:hot={HOT_FRAC},seed={SEED},base={base}"


def build_skew(base_dir: str, out_dir: str) -> str:
    """Materialize the skewed twin of ``base_dir`` (idempotent; rebuilt
    when the scheme marker is absent or mismatched)."""
    scheme = _skew_scheme(base_dir)
    try:
        with open(f"{out_dir}/_GENSCHEME") as f:
            fresh = f.read().strip() == scheme
    except OSError:
        fresh = False
    if fresh and os.path.exists(f"{out_dir}/lineitem.parquet"):
        return out_dir
    tmp = out_dir + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    rng = np.random.default_rng(SEED)
    for fname in sorted(os.listdir(base_dir)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[: -len(".parquet")]
        src = os.path.join(base_dir, fname)
        if name in _SKEWED_KEYS:
            pq.write_table(_skew_table(src, _SKEWED_KEYS[name], rng), f"{tmp}/{fname}")
        else:
            shutil.copy(src, f"{tmp}/{fname}")
    with open(f"{tmp}/_GENSCHEME", "w") as f:
        f.write(scheme + "\n")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return out_dir


def build_text_variant(base_dir: str, out_dir: str, kind: str) -> str:
    """Materialize a hot-shingle / hot-band twin of a longdocs tier
    (documents.parquet only; idempotent).  The base tier's ``_GENSCHEME``
    marker is copied into the variant and compared on reuse (r13): a
    variant built from an older longdocs generation next to a freshly
    regenerated base would silently time two different corpora."""
    from tools.make_longdocs import _MARKER

    def _read_marker(d: str) -> str | None:
        try:
            with open(os.path.join(d, _MARKER)) as f:
                return f.read()
        except OSError:
            return None

    base_marker = _read_marker(base_dir)
    if (
        os.path.exists(f"{out_dir}/documents.parquet")
        and base_marker is not None
        and _read_marker(out_dir) == base_marker
    ):
        return out_dir
    tmp = out_dir + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    rng = np.random.default_rng(SEED)
    tbl = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    texts = tbl.column("text").to_pylist()
    planted = rng.random(len(texts)) < HOT_FRAC
    for i, hit in enumerate(planted):
        if not hit:
            continue
        if kind == "hotshingle":
            if texts[i].count(" ") + 1 >= _MIN_FOOTER_TOKENS:
                texts[i] = texts[i] + " " + _FOOTER
        else:  # hotband
            texts[i] = f"{_BOILER} uniqa{i} uniqb{i} uniqc{i}"
    out = tbl.set_column(
        tbl.schema.get_field_index("text"), tbl.schema.field("text"), pa.array(texts, pa.string())
    )
    out = out.set_column(
        out.schema.get_field_index("n_chars"),
        out.schema.field("n_chars"),
        pa.array([len(t) for t in texts], pa.int64()),
    )
    pq.write_table(out, f"{tmp}/documents.parquet")
    if base_marker is not None:
        with open(os.path.join(tmp, _MARKER), "w") as f:
            f.write(base_marker)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return out_dir


def _main_text(argv: list[str], emit_json: bool) -> int:
    names = argv or list(TEXT_AUDITED)
    unknown = [n for n in names if n not in TEXT_AUDITED]
    if unknown:
        print(f"unknown query name(s): {', '.join(unknown)}", file=sys.stderr)
        print(f"audited set: {', '.join(TEXT_AUDITED)}", file=sys.stderr)
        return 2

    from tools.make_longdocs import ensure_longdocs

    tiers = dict((f"x{int(s)}", d) for d, s in ensure_longdocs())
    base_dir = tiers["x4"]
    variants = {
        kind: build_text_variant(base_dir, os.path.join(_LOCALDATA, f"{kind}_x4"), kind)
        for kind in sorted(set(TEXT_AUDITED.values()))
    }

    os.environ["SPARK_GRAFT_NO_COMPACT"] = "1"

    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("skew-audit-text")
    queries = entrymod.queries()

    results = {}
    failures = []
    for name in names:
        kind = TEXT_AUDITED[name]
        per_layout = {}
        for label, d in (("uniform", base_dir), (kind, variants[kind])):
            queries[name](spark, d).collect()  # warmup
            best = math.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                queries[name](spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            per_layout[label] = best
        ratio = per_layout[kind] / per_layout["uniform"]
        ok = ratio <= MULTIPLE
        results[name] = {
            "tier": "longdocs_x4",
            "variant": kind,
            "uniform_sec": round(per_layout["uniform"], 4),
            "skewed_sec": round(per_layout[kind], 4),
            "ratio": round(ratio, 3),
            "gate": MULTIPLE,
            "ok": ok,
        }
        if not ok:
            failures.append(name)
        flag = "ok  " if ok else "FAIL"
        print(
            f"{flag} {name:28s} uniform={per_layout['uniform']:6.2f}s "
            f"{kind}={per_layout[kind]:6.2f}s  ratio={ratio:5.2f} "
            f"(gate {MULTIPLE}x)",
            file=sys.stderr,
        )

    if emit_json:
        print(json.dumps(results, indent=2))
    if failures:
        print(f"TEXT-SKEW BLOW-UPS: {failures}", file=sys.stderr)
        return 1
    print(
        f"{len(results)} queries absorb the 30% hot shingle/band within {MULTIPLE}x",
        file=sys.stderr,
    )
    return 0


def main() -> int:
    emit_json = "--json" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--json"]
    if "--text" in argv:
        argv.remove("--text")
        return _main_text(argv, emit_json)
    tier = "sf1"
    if "--tier" in argv:
        i = argv.index("--tier")
        if i + 1 >= len(argv) or argv[i + 1] not in ("sf1", "sf0.1"):
            print("--tier takes sf1 or sf0.1", file=sys.stderr)
            return 2
        tier = argv[i + 1]
        del argv[i : i + 2]
    names = argv or list(AUDITED)
    unknown = [n for n in names if n not in AUDITED]
    if unknown:
        print(f"unknown query name(s): {', '.join(unknown)}", file=sys.stderr)
        print(f"audited set: {', '.join(AUDITED)}", file=sys.stderr)
        return 2

    if tier == "sf1":
        from tools.make_sf1 import ensure_sf1

        base_dir = ensure_sf1()
    else:
        base_dir = "/root/testdata/sf0.1"
    skew_dir = build_skew(base_dir, os.path.join(_LOCALDATA, f"skew_{tier}"))

    # identical physical file shapes for both layouts (see module doc)
    os.environ["SPARK_GRAFT_NO_COMPACT"] = "1"

    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("skew-audit")
    queries = entrymod.queries()

    results = {}
    failures = []
    for name in names:
        per_layout = {}
        for label, d in (("uniform", base_dir), ("skewed", skew_dir)):
            queries[name](spark, d).collect()  # warmup (JIT, FS cache)
            best = math.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                queries[name](spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            per_layout[label] = best
        ratio = per_layout["skewed"] / per_layout["uniform"]
        ok = ratio <= MULTIPLE
        results[name] = {
            "tier": tier,
            "uniform_sec": round(per_layout["uniform"], 4),
            "skewed_sec": round(per_layout["skewed"], 4),
            "ratio": round(ratio, 3),
            "gate": MULTIPLE,
            "ok": ok,
        }
        if not ok:
            failures.append(name)
        flag = "ok  " if ok else "FAIL"
        print(
            f"{flag} {name:28s} uniform={per_layout['uniform']:6.2f}s "
            f"skewed={per_layout['skewed']:6.2f}s  ratio={ratio:5.2f} "
            f"(gate {MULTIPLE}x)",
            file=sys.stderr,
        )

    if emit_json:
        print(json.dumps(results, indent=2))
    if failures:
        print(f"SKEW BLOW-UPS: {failures}", file=sys.stderr)
        return 1
    print(f"{len(results)} queries absorb the 30% hot key within {MULTIPLE}x", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
