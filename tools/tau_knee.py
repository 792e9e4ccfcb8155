"""Locate the Jaccard verify-regime knee between τ=0.02 and τ=0.3.

The verify-join strategy boundary (operators/dedup.py
STREAM_VERIFY_MIN_TAU) was originally placed at 0.3, the lowest
MEASURED-linear threshold: dd22 (τ=0.5) and dd18 (containment τ=0.3)
measured near-linear through the longdocs doublings, while dd04
(τ=0.02) measured quadratic — with nothing measured in between (r13
verdict item 3).  This tool's r14 measurements located the knee (see
SCALE.md "The τ knee") and the boundary now sits at 0.2.  It runs the
dd04-shaped ``jaccard_pairs`` at
intermediate thresholds over the longdocs tiers and records, per
(τ, tier):

* ``candidates`` — |_overlap_candidates| before verification, the
  quantity whose growth actually separates the regimes (true output is
  linear by fixture construction, so a superlinear candidate exponent
  is pure prefix-filter leakage — and unlike wall time it cannot be
  confounded by a busy box);
* ``pairs`` — true output size (sanity: linear by construction);
* ``wall_sec`` — full-pipeline wall time with the SHIPPED per-τ verify
  strategy (broadcast below the boundary, shuffled-hash at/above).

and fits per-τ log-log exponents over the top doubling and the full
range.  Results feed the SCALE.md "τ knee" table; the boundary constant
should sit at the measured knee, not at the lowest point anyone
happened to measure.

Usage:
  python tools/tau_knee.py [--taus 0.1,0.2] [--min-tier 8] [--max-tier 32]
                           [--reps 1] [--shape longdocs|shortdocs] [--json]

Defaults: τ ∈ {0.1, 0.2, 0.3}, tiers x8..x32, 1 rep (min of reps when
>1), shape longdocs.  ``--shape shortdocs`` re-runs the sweep on the
opposite df-distribution (short docs, flat vocabulary — r15, checking
the knee is a property of the prefix-filter math rather than of one
corpus shape).  Deliberately expensive at low τ — budget with the
flags and say so where results are recorded (same convention as
scaling_audit).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = list(sys.argv[1:])

    def flag(name: str, default: str) -> str:
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    taus = [float(t) for t in flag("--taus", "0.1,0.2,0.3").split(",")]
    min_tier = float(flag("--min-tier", "8"))
    max_tier = float(flag("--max-tier", "32"))
    reps = int(flag("--reps", "1"))
    shape = flag("--shape", "longdocs")
    emit_json = "--json" in argv

    from tools.make_longdocs import ensure_docs

    tiers = [(d, s) for d, s in ensure_docs(shape) if min_tier <= s <= max_tier]
    if len(tiers) < 2:
        print("need >= 2 tiers to fit an exponent", file=sys.stderr)
        return 2

    from youtube_data_lakehouse_and_analysis_spark.operators import dedup as D
    from youtube_data_lakehouse_and_analysis_spark.operators.dedup import (
        _doc_arrays,
        _overlap_candidates,
        checkpoint,
        jaccard_overlap_bounds,
    )
    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    results: dict[str, dict] = {}
    for tau in taus:
        rows = []
        for d, scale in tiers:
            # FRESH SESSION per (τ, tier): localCheckpoint blocks from
            # earlier measurements survive in the block manager until
            # their RDDs are GC'd, and an 8-measurement-old session
            # OOM'd at a (τ, tier) the same code completes fresh —
            # measurement isolation beats a 6 s restart.
            spark = get_spark("tau-knee", cpus=8)
            spark.sparkContext.setLogLevel("ERROR")
            docs = spark.read.parquet(f"{d}/documents.parquet")
            # candidate count: rebuild the exact jaccard_pairs fragments
            # via the SHARED bound derivation (jaccard_overlap_bounds)
            # so this counts exactly the shipped candidate set
            sh = D.shingle_rows(docs)
            arr = checkpoint(jaccard_overlap_bounds(_doc_arrays(sh, "doc_id"), tau))
            n_cand = _overlap_candidates(arr, "doc_id").count()
            # wall + true output with the shipped strategy selection
            best, n_pairs = math.inf, None
            for _ in range(reps):
                t0 = time.perf_counter()
                n_pairs = D.jaccard_pairs(docs, threshold=tau).count()
                best = min(best, time.perf_counter() - t0)
            rows.append((scale, n_cand, n_pairs, best))
            print(
                f"tau={tau} x{int(scale)}: candidates={n_cand} pairs={n_pairs} "
                f"wall={best:.1f}s",
                file=sys.stderr,
            )
            spark.stop()

        def exp(a: float, b: float, sa: float, sb: float) -> float | None:
            if a <= 0 or b <= 0:
                return None
            return round(math.log(b / a) / math.log(sb / sa), 3)

        (s0, c0, p0, w0), (sa, ca, pa, wa), (sb, cb, pb, wb) = rows[0], rows[-2], rows[-1]
        results[str(tau)] = {
            "tiers": {
                f"x{int(s)}": {"candidates": c, "pairs": p, "wall_sec": round(w, 2)}
                for s, c, p, w in rows
            },
            "cand_exp_top": exp(ca, cb, sa, sb),
            "cand_exp_full": exp(c0, cb, s0, sb),
            "pairs_exp_top": exp(pa, pb, sa, sb),
            "wall_exp_top": exp(wa, wb, sa, sb),
            "reps": reps,
        }

    if emit_json:
        print(json.dumps(results, indent=2))
    for tau, r in results.items():
        print(
            f"tau={tau}: cand_exp_top={r['cand_exp_top']} "
            f"cand_exp_full={r['cand_exp_full']} wall_exp_top={r['wall_exp_top']}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
