"""Measure scaling exponents for the catalog's super-linear suspects.

SCALE.md argues each operator's 100 TB behavior from its plan shape; this
tool turns the riskiest of those arguments into MEASUREMENTS (r7 verdict
ask #5).  Each audited query runs at sf0.001 / sf0.01 / sf0.1 plus a
locally synthesized sf1 tier (r8 verdict ask #4; built on demand by
tools/make_sf1.py — ~6M lineitem rows, one more decade where the data
term, not per-job constant overhead, dominates) — a 1000× input range —
and the fitted log-log slope between the two LARGEST scales must stay
within the operator's documented bound.  A super-linear regression
(e.g. a wedge join gone quadratic, a containment pass gone all-pairs)
shows up as an exponent blow-up long before it shows up as a wall-clock
problem at test scale.

Bounds are deliberately generous (+ margin over the theoretical slope):
the point is catching O(n^2) pretending to be O(n), not flagging noise.
A measured exponent SMALLER than the bound is expected — per-job constant
overhead flattens the small end, and several operators carry bounded legs
(sampled truth sets, capped buckets) that do not grow with the corpus.

Usage: python tools/scaling_audit.py [--json] [--no-sf1] [query ...]
       python tools/scaling_audit.py --longdocs [--json] [query ...]
Exit 0 = every audited operator inside its bound.

``--reps N`` overrides the per-(query, scale) repetition count (default
3; min is taken); ``--max-tier S`` drops tiers above scale S and
``--min-tier S`` drops tiers below it — all for budgeting deliberately
expensive re-measures (e.g. dd04's pinned quadratic regime, where one
x32 rep costs ~50 min; ``--min-tier 16`` re-fits just the top doubling
without re-paying the already-pinned small tiers).  Results produced
with non-default settings should say so wherever they are recorded.

``--longdocs`` (r12) audits the SHINGLE-FED operators on the longdocs
tiers (tools/make_longdocs.py: log-normal ~2 kB docs, Zipfian 50k-word
vocabulary, x1..x64 = 1k..64k docs) instead of the sf tiers.  The sf
documents tables are a friendly regime — 31-word vocab, every doc under
the combo cap; longdocs is the regime these operators target, where the
median doc overflows the cap (exercising the r12 spill legs) and hot
boilerplate shingles appear in ~10% of docs.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIRS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]
REPS = 3  # per (query, scale); min is taken (noise is one-sided)

# query -> (exponent bound, documented complexity argument)
AUDITED = {
    "gr03_triangle_count": (
        1.6,
        "degree-oriented wedges: O(m^1.5) in edges regardless of hub skew",
    ),
    "gr04_kcore_peel": (
        1.6,
        "peeling rounds = shrinking semi-joins; near-linear in edges",
    ),
    "dd18_containment_pairs": (
        1.5,
        "2-combo prefix signatures: candidates = pairs sharing >=2 shingles",
    ),
    "dd20_char_window_dup_mass": (
        1.3,
        "stride-windowed single pass, no self-join: linear in chars",
    ),
    "sim15_margin_knn": (
        1.5,
        "sampled truth legs by contract; candidate legs bucket-joined",
    ),
    "ia03_incremental_lsh_index": (
        1.5,
        "delta-only band probe + full-recompute eval leg (linear in bands)",
    ),
    "dd03_lsh_candidate_pairs": (
        1.5,
        "capped star-pairing: pairs linear in bucket membership",
    ),
    "sk02_kmv_set_ops": (
        1.3,
        "sketch construction: one pass + bounded K-row merges",
    ),
    "sim12_ivfpq_topk": (
        1.5,
        "IVF-PQ: broadcast codebooks, per-query limit(K) candidate sets",
    ),
    "dd06_embedding_near_dup": (
        1.6,
        "cell-blocked pairs: quadratic only within bounded cells",
    ),
}

# longdocs-tier audit set: the operators whose cost is driven by text
# volume and shingle statistics, measured where docs are long and the
# vocabulary is Zipfian.  Output (qualifying pairs) grows linearly by
# construction (prefix-stable dup plants), so a super-linear exponent
# here is candidate-generation waste, not workload growth.
LONGDOCS_AUDITED = {
    "dd04_jaccard_pairs": (
        2.2,
        "tau=0.02 verification shape: prefixes keep ~98% of shingles, so "
        "candidates are lower-bounded by sum(df^2) — quadratic for ANY "
        "lossless method at this looseness (measured 1.94 at x16, r12); "
        "the gate pins the constant and catches worse-than-quadratic",
    ),
    "dd22_jaccard_pairs_strict": (
        1.5,
        "tau=0.5 discovery: probe prefix n/3, index prefix n/2 — the "
        "regime the prefix filter is designed for must stay near-linear",
    ),
    "dd18_containment_pairs": (
        1.5,
        "same machinery, asymmetric bound: full index on the spill legs; "
        "the r13 >=2-distinct-keys spill filter is what keeps the "
        "candidate set linear (pre-fix x32->x64 measured 1.76)",
    ),
    "dd03_lsh_candidate_pairs": (
        1.5,
        "band-bucket join with star-pairing cap on hot buckets",
    ),
    "dd20_char_window_dup_mass": (
        1.3,
        "stride-windowed single pass, no self-join: linear in chars",
    ),
    "ta04_fingerprint": (
        1.3,
        "rolling-hash winnowing over bound char arrays: linear in chars",
    ),
    "ta08_char_chunks": (
        1.3,
        "map-side sequence+posexplode+substring: linear in chars",
    ),
}


def main() -> int:
    argv = list(sys.argv[1:])
    reps = REPS
    max_tier = None
    min_tier = None
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    if "--max-tier" in argv:
        i = argv.index("--max-tier")
        max_tier = float(argv[i + 1])
        del argv[i : i + 2]
    if "--min-tier" in argv:
        i = argv.index("--min-tier")
        min_tier = float(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    emit_json = "--json" in argv
    longdocs = "--longdocs" in argv
    audited = LONGDOCS_AUDITED if longdocs else AUDITED
    names = args or list(audited)
    unknown = [n for n in names if n not in audited]
    if unknown:
        print(f"unknown query name(s): {', '.join(unknown)}", file=sys.stderr)
        print(f"audited set: {', '.join(sorted(audited))}", file=sys.stderr)
        sys.exit(2)

    if longdocs:
        from tools.make_longdocs import ensure_longdocs

        sf_dirs = ensure_longdocs()
    else:
        sf_dirs = list(SF_DIRS)
        if "--no-sf1" not in argv:
            from tools.make_sf1 import ensure_sf1

            sf_dirs.append((ensure_sf1(), 1.0))
    if max_tier is not None:
        sf_dirs = [(d, s) for d, s in sf_dirs if s <= max_tier]
    if min_tier is not None:
        sf_dirs = [(d, s) for d, s in sf_dirs if s >= min_tier]
    if len(sf_dirs) < 2:
        print("--max-tier/--min-tier leave fewer than 2 tiers; nothing to fit", file=sys.stderr)
        return 2

    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("scaling-audit", cpus=8)
    queries = entrymod.queries()

    if longdocs:
        # Spill-key distinctness canary at the scale the spill legs
        # actually target (ADVICE r13): the fixtures' pytest invariant
        # runs on a 31-word vocabulary; here the Zipfian 50k-word corpus
        # of the LARGEST selected tier certifies that no two distinct
        # shingles collide on the 128-bit (dual-xxhash64) spill key the
        # ≥2-distinct-keys filter counts (operators/dedup.py).  One
        # linear aggregation; hard-fails the audit on any collision.
        from pyspark.sql import functions as F

        from youtube_data_lakehouse_and_analysis_spark.operators import dedup as D

        top_dir, top_scale = sf_dirs[-1]
        docs = spark.read.parquet(os.path.join(top_dir, "documents.parquet"))
        sh = D.shingle_rows(docs).select("shingle").distinct()
        n_sh, n_key = sh.agg(
            F.count("*"),
            F.count_distinct(
                F.struct(F.xxhash64("shingle"), F.xxhash64(F.lit("spill-k2"), "shingle"))
            ),
        ).collect()[0]
        print(
            f"spill-key canary x{int(top_scale)}: {n_sh} distinct shingles, "
            f"{n_key} distinct 128-bit keys",
            file=sys.stderr,
        )
        if n_sh != n_key or n_sh == 0:
            print("SPILL-KEY COLLISION: distinct shingles != distinct keys", file=sys.stderr)
            return 1

    results = {}
    failures = []
    for name in names:
        bound, why = audited[name]
        times = []
        for sf_dir, sf in sf_dirs:
            best = math.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            times.append((sf, best))
        # slope over the largest measured decade (0.1 -> 1 when the local
        # sf1 tier is present, else 0.01 -> 0.1): constant overhead
        # contributes least there; the full 3-point fit is reported too
        (sf_a, t_a), (sf_b, t_b) = times[-2], times[-1]
        exp_top = math.log(t_b / t_a) / math.log(sf_b / sf_a)
        (sf_0, t_0) = times[0]
        exp_full = math.log(t_b / t_0) / math.log(sf_b / sf_0)
        ok = exp_top <= bound
        results[name] = {
            "times_sec": {str(sf): round(t, 4) for sf, t in times},
            "exponent_top_decade": round(exp_top, 3),
            "exponent_full_range": round(exp_full, 3),
            "bound": bound,
            "ok": ok,
            "reps": reps,
            "argument": why,
        }
        if not ok:
            failures.append(name)
        flag = "ok  " if ok else "FAIL"
        print(
            f"{flag} {name:32s} exp={exp_top:5.2f} (bound {bound})  "
            f"t={['%.2fs' % t for _, t in times]}",
            file=sys.stderr,
        )

    if emit_json:
        print(json.dumps(results, indent=2))
    if failures:
        print(f"EXPONENT VIOLATIONS: {failures}", file=sys.stderr)
        return 1
    print(f"{len(results)} operators inside their scaling bounds", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
