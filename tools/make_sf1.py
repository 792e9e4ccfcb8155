"""Synthesize an sf1 tier for the scaling audit (r8 verdict ask #4).

The driver ships sf0.001/sf0.01/sf0.1 only, and the audit's fitted
exponents over sf0.01→sf0.1 sit in the range where per-job constant
overhead still flattens the slope.  This tool manufactures ONE more
decade — ~6M lineitem rows, comfortably inside the 128 GiB box — so the
audit can re-fit over sf0.1→sf1 where the data term dominates.

Faithfulness contract (the exponents are only meaningful if sf1 scales
the way the driver's generator scales between its own tiers, measured
empirically from sf0.01→sf0.1):

* ``lineitem/orders/customer/part/supplier/events`` grow LINEARLY in sf
  with contiguous 0-based keys → ten key-offset copies of sf0.1, each
  copy internally join-consistent (copy c's lineitem rows reference copy
  c's orders/parts/suppliers).  Payload distributions are exactly the
  sf0.1 marginals; cross-copy key disjointness mirrors the linear growth
  of every entity's cardinality (parts 2k→20k, users 150→1500, …).
* ``region/nation`` are fixed dimension tables at every tier → copied.
* ``documents`` grow linearly (500→5000) over a FIXED 31-word vocab,
  uniform 10..100 token lengths, 20 uniform sources, an ~41/15/15/15/14
  lang split, and ~0.3% of rows in exact-duplicate families — all
  measured from the shipped tiers and re-sampled fresh here (NOT cloned:
  verbatim copies would plant 10× near-dup families the real generator
  does not produce and corrupt the LSH/containment exponents).
* ``embeddings`` grow ~4× per decade (500→500→2000 across the shipped
  tiers) with 10 fixed labels, 64 dims, unit norm, and a weak label pull
  (mean cos-to-centroid ≈ 0.07 at sf0.1) → 8000 fresh vectors drawn as
  normalize(gauss + β·centroid_dir) with β calibrated to that pull.

Deterministic (numpy default_rng(421)); writes to
``<repo>/.localdata/sf1`` (gitignored — ~200 MB of parquet is data, not
source).  Import ``ensure_sf1()`` to build-if-missing.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
COPIES = 10
SEED = 421

# Generation-scheme marker (r13, same pattern as make_longdocs): bump the
# version on ANY change to the tiling/synthesis scheme or its parameters
# so a cached pre-change sf1 is regenerated instead of silently reused.
GEN_SCHEME = f"sf1-v1:seed={SEED},copies={COPIES},src={SRC}"
_MARKER = "_GENSCHEME"

# key column -> per-copy offset stride (the sf0.1 cardinality of its entity)
_KEY_STRIDES = {
    "o_orderkey": 150_000,
    "l_orderkey": 150_000,
    "o_custkey": 15_000,
    "c_custkey": 15_000,
    "l_partkey": 20_000,
    "p_partkey": 20_000,
    "l_suppkey": 1_000,
    "s_suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
}

_TILED = ("customer", "supplier", "part", "orders", "lineitem", "events")
_COPIED = ("region", "nation")

_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
_LANGS = ["en", "zh", "es", "fr", "de"]
_LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
_N_DOCS = 50_000
_DUP_PAIRS = 80  # ~0.3% of rows in exact-dup families, the sf0.1 rate
_N_VECS = 8_000
_DIMS = 64
_N_LABELS = 10
_LABEL_PULL = 0.56  # β: mean cos-to-centroid ≈ β/√dims ≈ 0.07


def _tile_table(name: str, out_dir: str) -> None:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for c in range(COPIES):
        cols = []
        for field in src.schema:
            col = src.column(field.name)
            stride = _KEY_STRIDES.get(field.name)
            if stride is not None and c > 0:
                col = pa.chunked_array(
                    [pa.compute.add(ch, c * stride).cast(field.type) for ch in col.chunks]
                )
            cols.append(col)
        parts.append(pa.table(cols, schema=src.schema))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet")


def _make_documents(rng: np.random.Generator, out_dir: str) -> None:
    src_schema = pq.read_schema(f"{SRC}/documents.parquet")
    lens = rng.integers(10, 101, size=_N_DOCS)
    vocab = np.array(_VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=n)]) for n in lens]
    dup_idx = rng.choice(_N_DOCS, size=2 * _DUP_PAIRS, replace=False)
    for a, b in dup_idx.reshape(-1, 2):
        texts[int(b)] = texts[int(a)]
    langs = rng.choice(_LANGS, size=_N_DOCS, p=_LANG_P)
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, size=_N_DOCS)])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(_N_DOCS, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(sources.tolist(), pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        },
        schema=src_schema,
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")


def _make_embeddings(rng: np.random.Generator, out_dir: str) -> None:
    src_schema = pq.read_schema(f"{SRC}/embeddings.parquet")
    cents = rng.normal(size=(_N_LABELS, _DIMS))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, _N_LABELS, size=_N_VECS).astype(np.int32)
    g = rng.normal(size=(_N_VECS, _DIMS))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    v = g * np.sqrt(_DIMS) + _LABEL_PULL * cents[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(_N_VECS, dtype=np.int64)),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(labels),
        },
        schema=src_schema,
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")


def build(out_dir: str = DEFAULT_OUT) -> str:
    tmp = out_dir + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    rng = np.random.default_rng(SEED)
    for name in _COPIED:
        shutil.copy(f"{SRC}/{name}.parquet", f"{tmp}/{name}.parquet")
    for name in _TILED:
        _tile_table(name, tmp)
    _make_documents(rng, tmp)
    _make_embeddings(rng, tmp)
    with open(f"{tmp}/{_MARKER}", "w") as f:
        f.write(GEN_SCHEME + "\n")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return out_dir


def ensure_sf1(out_dir: str = DEFAULT_OUT) -> str:
    """Build sf1 if absent or generated under an older scheme; return its path."""
    try:
        with open(f"{out_dir}/{_MARKER}") as f:
            fresh = f.read().strip() == GEN_SCHEME
    except OSError:
        fresh = False
    if fresh and os.path.exists(f"{out_dir}/lineitem.parquet"):
        return out_dir
    return build(out_dir)


if __name__ == "__main__":
    print(build())
