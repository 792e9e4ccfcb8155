"""Synthesize the document fixture tiers for the text-surface scaling
audits (r11 verdict ask #3; second corpus shape added r15, verdict
ask #3 of r14).

The driver's shipped ``documents`` tables are an unrealistically friendly
regime for the shingle-fed operators: ~31-word vocabulary, uniform
10..100-token lengths, ~300 B median text.  Every doc sits far below the
combo cap, document frequencies are saturated, and the measured scaling
constants say little about the regime the operators actually target —
web-scale corpora where the median document is kilobytes long, the
vocabulary is Zipfian, and a handful of boilerplate shingles appear in a
visible fraction of all documents.

This tool manufactures that regime, deterministically, in named SHAPES:

* ``longdocs`` (r11, the original) — **Lengths** log-normal,
  ``tokens ~ exp(N(ln 300, 0.8))`` clipped to [10, 8000]: median ~300
  tokens ≈ 2 kB of text, heavy multi-kB tail (median distinct
  3-shingles ≈ 300 ≫ the 256 combo cap, so the r12 spill legs — not
  just the combo path — carry the load).  **Vocabulary** 50 000 words
  drawn Zipf(s=1.05): the top word lands in ~8% of token positions, so
  hot TRIGRAMS naturally occur in ~10% of documents — the
  boilerplate-shingle hazard a real corpus contains.
* ``boilerdocs`` (r15) — the ADVERSARIAL df-distribution: longdocs
  lengths but Zipf(s=1.3), putting the top word in ~25% of positions —
  boilerplate shingles saturate far harder than any realistic web
  corpus, probing whether the verify-boundary knee can cross 0.2.
* ``shortdocs`` (r15) — the OPPOSITE df-distribution, for testing that
  constants tuned on longdocs (e.g. STREAM_VERIFY_MIN_TAU) are
  shape-robust rather than fit to one corpus: median ~60 tokens
  (sigma 0.5, clip [10, 2000]) keeps the median document UNDER the
  combo cap so the combo path dominates, and a flat Zipf(s=0.7) over a
  10 000-word vocabulary spreads document frequencies thin (no
  saturated boilerplate shingles).  Different seed → disjoint texts.

Common to all shapes:

* **Duplication** — prefix-stable plants so every tier has the same dup
  density: doc i is a near-dup of doc i-20 (5% of token positions
  resampled) when ``i % 50 == 25``, and an exact dup of doc i-30 when
  ``i % 100 == 99``.
* **Tiers** — x1..x64 = 1k..64k docs, NESTED: doc i draws from
  its OWN ``default_rng(seed·1000003 + i)`` (r12), so tier k is a
  byte-identical prefix of every larger tier and adding tiers never
  regenerates existing docs.  Exponents measure pure corpus growth of
  one distribution, not sampling drift.  Only ``documents.parquet`` is
  written per tier: every audited operator loads only that table.
* **Generation marker** (r13, ADVICE) — every tier directory carries a
  ``_GENSCHEME`` file recording the seed-scheme version and the
  distribution parameters.  ``ensure_docs`` regenerates ALL tiers of a
  shape whenever any marker is absent or mismatched: a cached tier from
  an older scheme sitting next to a newly generated larger tier would
  silently break the tier-prefix invariant and corrupt every exponent
  fit.  Adding NEW tiers does not bump the scheme (per-doc seeding
  makes nesting hold across tier extensions by construction); changing
  any distribution parameter or the seeding rule MUST bump
  ``GEN_SCHEME_VERSION``.

Schema matches the shipped table exactly (doc_id/text/lang/source/
n_chars with the shipped lang split and 20 uniform sources).
Deterministic; writes to ``<repo>/.localdata/<shape>/x{1,2,...,64}``
(gitignored — data, not source).  Import ``ensure_longdocs()`` /
``ensure_docs("shortdocs")`` to build-if-missing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LOCALDATA = os.path.join(_ROOT, ".localdata")
DEFAULT_OUT = os.path.join(_LOCALDATA, "longdocs")

TIERS = (1, 2, 4, 8, 16, 32, 64)
_BASE_DOCS = 1000
_NEAR_DUP_MUTATE = 0.05
_LANGS = ["en", "zh", "es", "fr", "de"]
_LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
_N_SOURCES = 20

# Bump on ANY change to the per-doc seeding rule or a shared parameter —
# the marker string embeds the per-shape parameters, so a parameter
# change invalidates exactly that shape's cached tiers (module doc).
GEN_SCHEME_VERSION = "perdoc-v2"

# shape -> (seed, vocab, zipf_s, med_tokens, sigma, min_tokens, max_tokens)
SHAPES: dict[str, tuple[int, int, float, int, float, int, int]] = {
    "longdocs": (1207, 50_000, 1.05, 300, 0.8, 10, 8000),
    "shortdocs": (2113, 10_000, 0.7, 60, 0.5, 10, 2000),
    # The adversarial direction (r15): Zipf(1.3) puts the top word in
    # ~25% of token positions, so boilerplate trigrams saturate far
    # harder than longdocs — the one shape the STREAM_VERIFY_MIN_TAU
    # docstring names as grounds to re-measure the knee.
    "boilerdocs": (3517, 50_000, 1.3, 300, 0.8, 10, 8000),
}


def _scheme(shape: str) -> str:
    seed, vocab, zipf_s, med, sigma, lo, hi = SHAPES[shape]
    # Format identical to the pre-r15 single-shape string so existing
    # longdocs tier caches stay valid (marker is byte-compatible).
    return (
        f"{GEN_SCHEME_VERSION}:seed={seed},vocab={vocab},zipf={zipf_s},"
        f"med={med},sigma={sigma},clip={lo}-{hi},"
        f"mut={_NEAR_DUP_MUTATE},base={_BASE_DOCS}"
    )


GEN_SCHEME = _scheme("longdocs")  # back-compat export
_MARKER = "_GENSCHEME"


def _zipf_cdf(vocab: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, vocab + 1) ** s
    return np.cumsum(w / w.sum())


def _generate(n_docs: int, shape: str) -> pa.Table:
    # Per-doc seeding (r12): doc i's randomness comes from its OWN
    # generator, so doc i is byte-identical no matter how many docs the
    # run generates — tier nesting survives ANY future TIERS extension.
    # (The first form drew the length vector for all n_docs before the
    # doc loop, so extending the generation shifted the shared stream
    # and silently regenerated every doc.)
    seed, vocab, zipf_s, med, sigma, lo, hi = SHAPES[shape]
    cdf = _zipf_cdf(vocab, zipf_s)
    words = np.array([f"tok{i}" for i in range(vocab)])

    token_ids: list[np.ndarray] = []
    lang_list: list[str] = []
    src_list: list[str] = []
    for i in range(n_docs):
        rng = np.random.default_rng(seed * 1_000_003 + i)
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
        length = int(np.clip(np.exp(rng.normal(np.log(med), sigma)), lo, hi))
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


def _marker_ok(tier_dir: str, shape: str) -> bool:
    try:
        with open(os.path.join(tier_dir, _MARKER)) as f:
            return f.read().strip() == _scheme(shape)
    except OSError:
        return False


def ensure_docs(shape: str = "longdocs", out_root: str | None = None) -> list[tuple[str, float]]:
    """Build-if-missing; returns [(tier_dir, scale), ...] smallest first.

    A tier counts as present only when both its parquet AND its
    ``_GENSCHEME`` marker match the current scheme; a stale marker on
    ANY tier regenerates ALL tiers of the shape (prefix invariant)."""
    if shape not in SHAPES:
        raise KeyError(f"unknown corpus shape {shape!r}; expected one of {sorted(SHAPES)}")
    out_root = out_root or os.path.join(_LOCALDATA, shape)
    tiers = []
    missing = []
    stale = False
    for k in TIERS:
        d = os.path.join(out_root, f"x{k}")
        tiers.append((d, float(k)))
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            missing.append((d, k))
        elif not _marker_ok(d, shape):
            stale = True
    if stale:
        missing = [(d, int(s)) for d, s in tiers]
    if missing:
        full = _generate(_BASE_DOCS * TIERS[-1], shape)
        for d, k in missing:
            os.makedirs(d, exist_ok=True)
            pq.write_table(full.slice(0, _BASE_DOCS * k), os.path.join(d, "documents.parquet"))
            with open(os.path.join(d, _MARKER), "w") as f:
                f.write(_scheme(shape) + "\n")
    return tiers


def ensure_longdocs(out_root: str = DEFAULT_OUT) -> list[tuple[str, float]]:
    """Back-compat wrapper: the original longdocs shape."""
    return ensure_docs("longdocs", out_root)


if __name__ == "__main__":
    import sys

    shape = sys.argv[1] if len(sys.argv) > 1 else "longdocs"
    for d, k in ensure_docs(shape):
        t = pq.read_table(os.path.join(d, "documents.parquet"))
        sizes = [len(x) for x in t.column("text").to_pylist()]
        print(
            f"{shape} x{int(k)}: {t.num_rows} docs, median {int(np.median(sizes))} B, "
            f"mean {int(np.mean(sizes))} B, max {max(sizes)} B"
        )
