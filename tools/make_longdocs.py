"""Synthesize the `longdocs` fixture tiers for the text-surface scaling
audit (r11 verdict ask #3).

The driver's shipped ``documents`` tables are an unrealistically friendly
regime for the shingle-fed operators: ~31-word vocabulary, uniform
10..100-token lengths, ~300 B median text.  Every doc sits far below the
combo cap, document frequencies are saturated, and the measured scaling
constants say little about the regime the operators actually target —
web-scale corpora where the median document is kilobytes long, the
vocabulary is Zipfian, and a handful of boilerplate shingles appear in a
visible fraction of all documents.

This tool manufactures that regime, deterministically:

* **Lengths** — log-normal, ``tokens ~ exp(N(ln 300, 0.8))`` clipped to
  [10, 8000]: median ~300 tokens ≈ 2 kB of text, with a heavy tail of
  multi-kB documents (median distinct 3-shingles ≈ 300 ≫ the 256 combo
  cap, so the r12 spill legs — not just the combo path — carry the load).
* **Vocabulary** — 50 000 words drawn Zipf(s=1.05): the top word lands in
  ~8% of token positions, so hot TRIGRAMS (top-word runs) naturally occur
  in ~10% of documents — the boilerplate-shingle hazard a real corpus
  contains, with no hand-planting needed.
* **Duplication** — prefix-stable plants so every tier has the same dup
  density: doc i is a near-dup of doc i-20 (5% of token positions
  resampled) when ``i % 50 == 25``, and an exact dup of doc i-30 when
  ``i % 100 == 99``.
* **Tiers** — x1..x64 = 1k..64k docs, NESTED: doc i draws from
  its OWN ``default_rng(SEED·1000003 + i)`` (r12), so tier k is a
  byte-identical prefix of every larger tier and adding tiers never
  regenerates existing docs.  Exponents measure pure corpus growth of
  one distribution, not sampling drift.  Only ``documents.parquet`` is
  written per tier: every audited operator loads only that table.

* **Generation marker** (r13, ADVICE) — every tier directory carries a
  ``_GENSCHEME`` file recording the seed-scheme version and the
  distribution parameters.  ``ensure_longdocs`` regenerates ALL tiers
  whenever any marker is absent or mismatched: a cached tier from an
  older scheme sitting next to a newly generated larger tier would
  silently break the tier-prefix invariant and corrupt every exponent
  fit.  Adding NEW tiers does not bump the scheme (per-doc seeding
  makes nesting hold across tier extensions by construction); changing
  any distribution parameter or the seeding rule MUST bump
  ``GEN_SCHEME_VERSION``.

Schema matches the shipped table exactly (doc_id/text/lang/source/
n_chars with the shipped lang split and 20 uniform sources).
Deterministic; writes to ``<repo>/.localdata/longdocs/x{1,2,...,32}``
(gitignored — data, not source).  Import ``ensure_longdocs()`` to
build-if-missing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(_ROOT, ".localdata", "longdocs")

SEED = 1207
TIERS = (1, 2, 4, 8, 16, 32, 64)
_BASE_DOCS = 1000
_VOCAB = 50_000
_ZIPF_S = 1.05
_MED_TOKENS = 300
_SIGMA = 0.8
_MIN_TOKENS, _MAX_TOKENS = 10, 8000
_NEAR_DUP_MUTATE = 0.05
_LANGS = ["en", "zh", "es", "fr", "de"]
_LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
_N_SOURCES = 20

# Bump on ANY change to the per-doc seeding rule or a distribution
# parameter above — the marker string embeds both, so either kind of
# change invalidates every cached tier (see module docstring).
GEN_SCHEME_VERSION = "perdoc-v2"
GEN_SCHEME = (
    f"{GEN_SCHEME_VERSION}:seed={SEED},vocab={_VOCAB},zipf={_ZIPF_S},"
    f"med={_MED_TOKENS},sigma={_SIGMA},clip={_MIN_TOKENS}-{_MAX_TOKENS},"
    f"mut={_NEAR_DUP_MUTATE},base={_BASE_DOCS}"
)
_MARKER = "_GENSCHEME"


def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.arange(1, _VOCAB + 1) ** _ZIPF_S
    return np.cumsum(w / w.sum())


def _generate(n_docs: int) -> pa.Table:
    # Per-doc seeding (r12): doc i's randomness comes from its OWN
    # generator, so doc i is byte-identical no matter how many docs the
    # run generates — tier nesting survives ANY future TIERS extension.
    # (The first form drew the length vector for all n_docs before the
    # doc loop, so extending the generation shifted the shared stream
    # and silently regenerated every doc.)
    cdf = _zipf_cdf()
    words = np.array([f"tok{i}" for i in range(_VOCAB)])

    token_ids: list[np.ndarray] = []
    lang_list: list[str] = []
    src_list: list[str] = []
    for i in range(n_docs):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        lang_list.append(_LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))])
        src_list.append(f"src{int(rng.integers(0, _N_SOURCES))}")
        if i % 100 == 99 and i >= 30:
            token_ids.append(token_ids[i - 30])  # exact dup
            continue
        if i % 50 == 25 and i >= 20:
            base = token_ids[i - 20].copy()
            flips = rng.random(base.size) < _NEAR_DUP_MUTATE
            base[flips] = np.searchsorted(cdf, rng.random(int(flips.sum())))
            token_ids.append(base)
            continue
        length = int(
            np.clip(
                np.exp(rng.normal(np.log(_MED_TOKENS), _SIGMA)), _MIN_TOKENS, _MAX_TOKENS
            )
        )
        token_ids.append(np.searchsorted(cdf, rng.random(length)))

    texts = [" ".join(words[t]) for t in token_ids]
    langs = np.array(lang_list)
    sources = np.array(src_list)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
        }
    )


def _marker_ok(tier_dir: str) -> bool:
    try:
        with open(os.path.join(tier_dir, _MARKER)) as f:
            return f.read().strip() == GEN_SCHEME
    except OSError:
        return False


def ensure_longdocs(out_root: str = DEFAULT_OUT) -> list[tuple[str, float]]:
    """Build-if-missing; returns [(tier_dir, scale), ...] smallest first.

    A tier counts as present only when both its parquet AND its
    ``_GENSCHEME`` marker match the current scheme; a stale marker on
    ANY tier regenerates ALL tiers (prefix invariant, module doc)."""
    tiers = []
    missing = []
    stale = False
    for k in TIERS:
        d = os.path.join(out_root, f"x{k}")
        tiers.append((d, float(k)))
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            missing.append((d, k))
        elif not _marker_ok(d):
            stale = True
    if stale:
        missing = [(d, int(s)) for d, s in tiers]
    if missing:
        full = _generate(_BASE_DOCS * TIERS[-1])
        for d, k in missing:
            os.makedirs(d, exist_ok=True)
            pq.write_table(full.slice(0, _BASE_DOCS * k), os.path.join(d, "documents.parquet"))
            with open(os.path.join(d, _MARKER), "w") as f:
                f.write(GEN_SCHEME + "\n")
    return tiers


if __name__ == "__main__":
    for d, k in ensure_longdocs():
        t = pq.read_table(os.path.join(d, "documents.parquet"))
        sizes = [len(x) for x in t.column("text").to_pylist()]
        print(
            f"x{int(k)}: {t.num_rows} docs, median {int(np.median(sizes))} B, "
            f"mean {int(np.mean(sizes))} B, max {max(sizes)} B"
        )
