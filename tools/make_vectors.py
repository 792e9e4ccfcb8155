"""Synthesize tiered `embeddings` fixtures for the vector-surface
scaling audit (r15) — the ANN analogue of tools/make_longdocs.py.

The driver's shipped embeddings tables top out at 2 000 vectors
(sf0.1), which exercises correctness but says nothing about how the
quantized-ANN column (sim04 IVF, sim11 PQ, sim12 IVF-PQ, sim13 recall)
behaves as the corpus grows.  This tool manufactures that growth,
deterministically:

* **Geometry** — 64-d float32 vectors drawn around ``_N_CLUSTERS`` = 32
  fixed Gaussian centers (centers from their own seeded generator, unit
  scale; per-vector noise sigma 0.35), with the assigned center id as
  the ``label`` column.  IVF cells are therefore REAL structure, not
  arbitrary partitions: cell populations are uniform-multinomial (skew
  ~1+3/sqrt(mean)), and distance-respecting codes should rank
  same-cluster candidates first.
* **Planted near-dups** — vector i is vector i−20 plus sigma=0.02 noise
  when ``i % 50 == 25`` and an exact copy of vector i−30 when
  ``i % 100 == 99`` (the longdocs plant pattern), so top-k truth has
  known easy hits and embedding-near-dup ops (dd06) can be audited on
  the same tiers.
* **Tiers** — x1..x64 = 1k..64k vectors, NESTED: vector i draws from
  its OWN ``default_rng(seed·1000003 + i)``, so tier k is a
  byte-identical prefix of every larger tier (exponent fits measure
  corpus growth, not sampling drift).
* **Schema** — exactly the shipped table: vec_id int64,
  embedding list<float32>, label int32; file name
  ``embeddings.parquet`` so ``catalog.load(spark, tier_dir,
  "embeddings")`` — and therefore every sim* catalog query — runs on a
  tier directory unchanged.
* **Generation marker** — same ``_GENSCHEME`` protocol as
  make_longdocs: any parameter change regenerates all tiers.

Writes to ``<repo>/.localdata/vectors/x{1,...,64}`` (gitignored).
Import ``ensure_vectors()`` to build-if-missing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(_ROOT, ".localdata", "vectors")

SEED = 6151
TIERS = (1, 2, 4, 8, 16, 32, 64)
_BASE_VECS = 1000
_DIM = 64
_N_CLUSTERS = 32
_CENTER_SCALE = 1.0
_NOISE = 0.35
_NEAR_DUP_NOISE = 0.02

GEN_SCHEME_VERSION = "pervec-v1"
_MARKER = "_GENSCHEME"


def _scheme() -> str:
    return (
        f"{GEN_SCHEME_VERSION}:seed={SEED},dim={_DIM},k={_N_CLUSTERS},"
        f"cscale={_CENTER_SCALE},noise={_NOISE},dupnoise={_NEAR_DUP_NOISE},"
        f"base={_BASE_VECS}"
    )


def _centers() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return rng.normal(0.0, _CENTER_SCALE, size=(_N_CLUSTERS, _DIM)).astype(np.float32)


def _generate(n_vecs: int) -> pa.Table:
    centers = _centers()
    vecs = np.empty((n_vecs, _DIM), dtype=np.float32)
    labels = np.empty(n_vecs, dtype=np.int32)
    for i in range(n_vecs):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        c = int(rng.integers(0, _N_CLUSTERS))
        if i % 100 == 99 and i >= 30:
            vecs[i] = vecs[i - 30]  # exact dup keeps the source's label
            labels[i] = labels[i - 30]
            continue
        if i % 50 == 25 and i >= 20:
            vecs[i] = vecs[i - 20] + rng.normal(0.0, _NEAR_DUP_NOISE, _DIM).astype(
                np.float32
            )
            labels[i] = labels[i - 20]
            continue
        labels[i] = c
        vecs[i] = centers[c] + rng.normal(0.0, _NOISE, _DIM).astype(np.float32)
    emb = pa.array(list(vecs), pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": emb,
            "label": pa.array(labels, pa.int32()),
        }
    )


def _marker_ok(tier_dir: str) -> bool:
    try:
        with open(os.path.join(tier_dir, _MARKER)) as f:
            return f.read().strip() == _scheme()
    except OSError:
        return False


def ensure_vectors(out_root: str = DEFAULT_OUT) -> list[tuple[str, float]]:
    """Build-if-missing; returns [(tier_dir, scale), ...] smallest first.
    Same stale-marker-regenerates-all protocol as ensure_docs."""
    tiers = []
    missing = []
    stale = False
    for k in TIERS:
        d = os.path.join(out_root, f"x{k}")
        tiers.append((d, float(k)))
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            missing.append((d, k))
        elif not _marker_ok(d):
            stale = True
    if stale:
        missing = [(d, int(s)) for d, s in tiers]
    if missing:
        full = _generate(_BASE_VECS * TIERS[-1])
        for d, k in missing:
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                full.slice(0, _BASE_VECS * k), os.path.join(d, "embeddings.parquet")
            )
            with open(os.path.join(d, _MARKER), "w") as f:
                f.write(_scheme() + "\n")
    return tiers


if __name__ == "__main__":
    for d, k in ensure_vectors():
        t = pq.read_table(os.path.join(d, "embeddings.parquet"))
        labs = t.column("label").to_numpy()
        counts = np.bincount(labs, minlength=_N_CLUSTERS)
        print(
            f"x{int(k)}: {t.num_rows} vecs, cells {counts.min()}-{counts.max()} "
            f"(skew {counts.max() / counts.mean():.2f})"
        )
