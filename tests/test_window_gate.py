"""Catalog-wide plan gate: NO unpartitioned Window over unbounded input.

An unpartitioned WindowExec moves every row to one task — the textbook
single-partition sort hazard at 100 TB.  This sweep walks the optimized
logical plan of EVERY catalog query and requires each query that contains
a Window with an empty partitionSpec to appear in the whitelist below with
a justification: either the window's input is BOUNDED (a histogram over a
domain-limited bin, a limit(K) table, a per-month rollup) or the query is
the documented exact/definitional form whose production swap ships
alongside it (sm07→sm07a, ev10→ev10a, global ntile→w08a) or an eval whose
exact truth leg is the point.

Any new query that introduces a global window fails here until justified —
the mechanical invariant the docstring promises used to carry alone.

Known blind spot: legs wrapped in localCheckpoint(eager=False) appear as
LogicalRDD leaves in the optimized plan, so windows INSIDE them escape
this sweep.  Audit of every checkpointed leg in the catalog (r7): gr03
edges, dd21 truth/cand, pp02 affinity, ia03 tagged, sim15 k1/scored,
sim16 scored, sm07a/ta19a/ev10a score legs, sk04 sketches — none contains
an unpartitioned window over unbounded input; sk02's union-sketch leg DID
(a global row_number over all distinct hashes) and was rewritten r7 to
the two-phase per-partition-heads + bounded-merge form (_topk_smallest in
plans/corpus6.py), whose only global window runs over <= K x n_partitions
rows.  Any new checkpointed leg must be added to this audit note.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

from .conftest import SF_DIR

# query name -> justification for every unpartitioned Window in its plan
WHITELIST = {
    # exact/definitional forms whose production swap is in the catalog
    "sm07_quality_weighted_sampling": "exact NTILE on per-doc score table; production swap = sm07a",
    "ev10_rfm_segments": "exact NTILEs on per-user profile table; production swap = ev10a",
    "w04_rank_flavors": "definitional ranking-flavor demo; partitioned form = w01, global swap = w08a",
    "ta19_lm_quality_gate": "exact terciles on per-doc LM scores; production swap = ta19a",
    # bounded-input windows (never the fact table)
    "sm07a_histogram_cdf_sampling": "CDF window over the integer-score histogram (domain-bounded)",
    "ev10a_rfm_segments_approx": "CDF windows over day/count/dollar histograms (domain-bounded)",
    "w08a_global_price_quartile": "CDF window over whole-dollar price histogram (domain-bounded)",
    "ta19a_lm_gate_histogram": "CDF window over the integer LM-score histogram (domain-bounded)",
    "po01_mom_growth": "lag over one-row-per-month rollup (bounded by calendar)",
    "w13_gini_concentration": "prefix sums over the whole-dollar spend histogram (domain-bounded)",
    "ta20_merge_apply": "row_number over the top-_N_MERGES merge list (8 rows)",
    "sim11_pq_topk": "rank over per-query limit(K) candidate set (bounded by K)",
    "sim12_ivfpq_topk": "rank over per-query limit(K) candidate set (bounded by K)",
    "sim13_pq_recall": "rank over sampled-truth limit(K) sets (bounded by K)",
    # agreement evals: the exact truth leg IS the point
    "sm07b_cdf_ntile_agreement": "eval: exact-NTILE truth leg + bounded CDF leg",
    "ev10b_rfm_agreement": "eval: exact-NTILE truth legs + bounded CDF legs",
    "w08b_global_quartile_agreement": "eval: exact-NTILE truth leg + bounded CDF leg",
    "ta19b_lm_gate_agreement": "eval: exact-NTILE truth leg + bounded CDF leg",
}


def _unpartitioned_windows(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    acc: list[str] = []

    def walk(node):
        if node.getClass().getSimpleName() == "Window" and node.partitionSpec().isEmpty():
            acc.append(node.windowExpressions().mkString(", ")[:120])
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(plan)
    return acc


def test_no_unwhitelisted_global_windows(spark):
    queries = entrymod.queries()
    offenders: dict[str, list[str]] = {}
    for name, fn in queries.items():
        wins = _unpartitioned_windows(fn(spark, SF_DIR))
        if wins and name not in WHITELIST:
            offenders[name] = wins
    assert not offenders, (
        "unpartitioned Window over possibly-unbounded input in: "
        + "; ".join(f"{n} ({len(w)})" for n, w in sorted(offenders.items()))
        + " — add a bounded-input/definitional justification to WHITELIST "
        "or repartition the window"
    )


def test_whitelist_has_no_stale_entries(spark):
    """Every whitelisted query must still exist and still contain an
    unpartitioned window — entries must not outlive the code they
    justify."""
    queries = entrymod.queries()
    stale = [n for n in WHITELIST if n not in queries]
    assert not stale, f"whitelisted queries no longer registered: {stale}"
    no_longer = [
        n for n in WHITELIST if not _unpartitioned_windows(queries[n](spark, SF_DIR))
    ]
    assert not no_longer, (
        f"whitelisted queries no longer contain a global window: {no_longer}"
    )
