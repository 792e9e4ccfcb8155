"""Catalog-wide physical-plan gates: no CartesianProduct, and Python
evaluation only where the catalog documents it (r8 — SHUFFLE_AUDIT.md's
prose triage, mechanized in the style of tests/test_window_gate.py).

Both sweeps run with SPARK_GRAFT_NO_CHECKPOINT=1 so lineage-truncated
legs cannot hide a bad node (same closure as the window gate).

Gate 1 — CartesianProduct: a condition-less join whose BOTH sides are
large plans as CartesianProductExec (|A|x|B| work and shuffle) — never
acceptable at 100 TB.  The catalog's 27 cross-join sites are all 1-row /
K-row broadcast combines, which plan as BroadcastNestedLoopJoin instead;
this gate pins that NO query ever degrades to the cartesian form.  No
whitelist: there is no legitimate use.

Gate 2 — Python eval: leaving the JVM is the documented slow path; it is
allowed ONLY where the operator genuinely needs numpy/pandas/UDTF logic
and the query's docstring says so.  The set of queries containing any
Python-eval node must EQUAL the whitelist — a subset check would let
stale entries rot, and a new Python node anywhere else (e.g. an
accidental row-at-a-time UDF in a hot path) fails the sweep.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

from .conftest import SF_DIR

# Queries whose plans legitimately contain Python evaluation nodes.
PYTHON_EVAL_WHITELIST = {
    "mm02_decode_features": "Arrow-batched media decode (mapInPandas) — the codec boundary",
    "mm03_frame_sample": "decode feeds frame explode; decode itself is the Python node",
    "mm04_modality_budget": "decode feeds the budget rollup",
    "mm05_phash_groups": "perceptual hash over payload bytes (mapInPandas)",
    "mm06_modality_packing": "decode feeds the packing manifest",
    "pd01_group_regression": "grouped-map applyInPandas surface (FlatMapGroupsInPandas)",
    "pd02_udtf_bigrams": "Python UDTF surface (BatchEvalPythonUDTF)",
    "pd03_grouped_agg_udf": "grouped-aggregate pandas UDF surface (ArrowAggregatePython)",
    "pd04_map_in_arrow": "raw-Arrow batch transform surface (MapInArrow)",
    "sim01_bruteforce_topk": "int64 matmul scoring block (mapInPandas) — the exact truth leg",
    "sim07_int8_quantized_topk": "r15: matmul_score_pairs kernel replaced the per-pair HOF dot (2.23→0.64 s)",
    "sim08_random_projection_topk": "r15: matmul_score_pairs kernel, same bounded-query contract",
    "sim09_ann_recall": "brute-force truth leg reuses sim01's scorer",
    "sim10_multiprobe_recall": "brute-force truth leg reuses sim01's scorer",
}

_PY_NODE = re.compile(
    r"MapInPandas|MapInArrow|FlatMapGroupsInPandas|InPandasWithState"
    r"|ArrowAggregatePython|ArrowEvalPython|BatchEvalPython"
)


@pytest.fixture(scope="module")
def physical_plans(spark):
    """One sweep: name -> physical explain string for every catalog query,
    built with checkpointing disabled so full plans are visible."""
    import os

    os.environ["SPARK_GRAFT_NO_CHECKPOINT"] = "1"
    try:
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        out = {}
        for name, fn in entrymod.queries().items():
            df = fn(spark, SF_DIR)
            out[name] = df._jdf.queryExecution().explainString(mode)
        return out
    finally:
        os.environ.pop("SPARK_GRAFT_NO_CHECKPOINT", None)


def test_no_cartesian_product_anywhere(physical_plans):
    offenders = [n for n, plan in physical_plans.items() if "CartesianProduct" in plan]
    assert offenders == [], (
        f"CartesianProduct (both-sides-large cross join) in: {offenders} — "
        "broadcast the small side or restructure; there is no whitelisted use"
    )


def test_python_eval_only_where_documented(physical_plans):
    have_python = {n for n, plan in physical_plans.items() if _PY_NODE.search(plan)}
    undeclared = sorted(have_python - PYTHON_EVAL_WHITELIST.keys())
    assert undeclared == [], (
        f"Python evaluation nodes outside the documented surface: {undeclared} "
        "— use built-in expressions, or add the query to PYTHON_EVAL_WHITELIST "
        "with the reason Python is genuinely required"
    )
    stale = sorted(PYTHON_EVAL_WHITELIST.keys() - have_python)
    assert stale == [], (
        f"whitelisted queries no longer contain Python nodes: {stale} — "
        "drop the stale entries"
    )
