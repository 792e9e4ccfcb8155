"""Physical-plan quality gates: the optimizations that matter at 100 TB
must be visible in the plan — parquet filter/column pushdown, broadcast
joins for dims, top-k without global sort, whole-stage codegen."""

from __future__ import annotations

import __spark_entry__ as entrymod

from .conftest import SF_DIR

QUERIES = entrymod.queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q01_filter_pushdown(spark):
    plan = formatted(spark, "q01_project_filter")
    assert "PushedFilters: [IsNotNull(c_name)]" in plan
    # column pruning: only c_name read
    assert "ReadSchema: struct<c_name:string>" in plan


def test_q03_topk_no_global_sort(spark):
    plan = plan_of(spark, "q03_topk_orders")
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no full sort


def test_j05_dims_broadcast(spark):
    plan = plan_of(spark, "j05_star_join")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_q05_window_single_shuffle(spark):
    plan = plan_of(spark, "q05_groupwise_max_window")
    # one exchange for the window partitioning; the final orderBy adds a
    # range exchange — but no join-related exchanges
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q08_year_predicate_reaches_scan(spark):
    plan = formatted(spark, "q08_distinct_year")
    # year(ts)=k must at least push IsNotNull + be applied pre-aggregation
    assert "PushedFilters" in plan
    assert "Scan parquet" in plan


def test_wholestage_codegen_on_agg(spark):
    df = QUERIES["a01_pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE only materializes codegen spans in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen'd operators
    assert "*(" in plan, plan[:500]


def test_j01_partial_aggregation(spark):
    """The join-then-agg must partial-aggregate before the final shuffle
    (HashAggregate appears twice: partial + final)."""
    plan = plan_of(spark, "j01_inner_join_agg")
    assert plan.count("HashAggregate") >= 2


def test_rj01_bucketized_not_nested_loop(spark):
    """The range join must hit the bucketized equi-join rewrite — a bare
    inequality join would plan CartesianProduct/BroadcastNestedLoopJoin."""
    plan = plan_of(spark, "rj01_range_join_agg")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_as01_asof_single_shuffle(spark):
    """The as-of join is union + one window pass: exactly one exchange
    (the key partitioning), no join operator at all."""
    plan = plan_of(spark, "as01_asof_join")
    assert plan.count("Exchange") == 1
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join_op not in plan


def test_sj01_salted_join_is_hash_join(spark):
    plan = plan_of(spark, "sj01_salted_join_agg")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_sim05_filter_reaches_documents_scan(spark):
    """Hybrid search: the metadata predicates must be pushed into the
    documents parquet scan, and only doc_id read from it."""
    plan = formatted(spark, "sim05_hybrid_filtered_ann")
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line and "n_chars" in line
    ]
    assert pushed, plan
    assert any("EqualTo(lang,en)" in line for line in pushed), pushed


def test_j11_dims_broadcast(spark):
    """TPC-H Q5 shape: region/nation/supplier chain must broadcast — only
    orders⋈lineitem and the customer join may shuffle."""
    plan = plan_of(spark, "j11_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # region, nation, supplier


def test_j12_semi_join_before_reagg(spark):
    """Q18 shape: the qualifying-orderkey filter must be a semi join (no
    row multiplication) and both aggregations must partial-aggregate."""
    plan = plan_of(spark, "j12_large_volume_customer")
    assert "LeftSemi" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final, twice


def test_j13_exists_becomes_semi_join(spark):
    """Catalyst must de-correlate the EXISTS into a semi join — no
    nested-loop per-row subquery execution."""
    plan = plan_of(spark, "j13_exists_subquery")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dd08_discard_set_broadcast(spark):
    """The canonical-corpus anti join must broadcast the (small) discard
    set rather than shuffling the corpus."""
    plan = plan_of(spark, "dd08_canonical_corpus")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_corpus_pipelines_use_hot_bucket_cap(spark, monkeypatch):
    """Corpus discovery pipelines must run LSH candidate generation with
    the hot-bucket cap (star pairing beyond DEFAULT_MAX_BUCKET_WIDTH) —
    the uncapped all-pairs join is the 100 TB boilerplate-skew bomb.
    Checkpointing truncates the visible plan, so record the call instead:
    every pipeline below must pass max_bucket_width (dd03 alone stays
    uncapped, as the definitional primitive)."""
    from youtube_data_lakehouse_and_analysis_spark.operators import dedup as D

    calls: list = []
    real = D.lsh_candidate_pairs

    def recording(band_keys, id_col="doc_id", max_bucket_width=None):
        calls.append(max_bucket_width)
        return real(band_keys, id_col=id_col, max_bucket_width=max_bucket_width)

    monkeypatch.setattr(D, "lsh_candidate_pairs", recording)
    for name in (
        "dd07_dup_clusters",
        "dd08_canonical_corpus",
        "dd11_edit_distance_verify",
        "dd15_cross_source_dup_matrix",
        "dd16_minhash_jaccard_estimate",
    ):
        calls.clear()
        QUERIES[name](spark, SF_DIR)
        assert calls == [D.DEFAULT_MAX_BUCKET_WIDTH], (name, calls)


def test_lsh_capped_plan_has_star_branch(spark):
    """The capped operator itself must plan the bucket-width window and
    the narrow/star union (not a disguised all-pairs join)."""
    from youtube_data_lakehouse_and_analysis_spark.catalog import load
    from youtube_data_lakehouse_and_analysis_spark.operators import dedup as D

    docs = load(spark, SF_DIR, "documents")
    keys = D.lsh_band_keys(D.minhash_signatures(docs, num_hashes=16), rows_per_band=4)
    df = D.lsh_candidate_pairs(keys, max_bucket_width=10)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "_width" in plan and "_hub" in plan
    assert "Union" in plan


def test_ta05_no_python_udf(spark):
    """Token counting must stay JVM-side (regexp_extract_all), never a
    Python UDF in the per-row hot path."""
    plan = plan_of(spark, "ta05_bpe_token_count")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_j14_preagg_join_broadcast_dim(spark):
    """Q17 shape: the per-part aggregate must shuffle lineitem only once
    (partial+final HashAggregate), and the name-filtered part dim must
    broadcast."""
    plan = plan_of(spark, "j14_small_qty_revenue")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 4  # per-part agg + final, each partial+final


def test_h04_exists_is_semi_join(spark):
    """TPC-H Q4 shape: the correlated EXISTS (with its cross-table date
    inequality) must plan as a hash semi join on orderkey, never a
    nested-loop subquery, and the quarter predicate must reach the scan."""
    plan = plan_of(spark, "h04_order_priority_check")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    fmt = formatted(spark, "h04_order_priority_check")
    assert "GreaterThanOrEqual(o_orderdate" in fmt, "quarter filter not pushed"


def test_h06_pure_scan_aggregate(spark):
    """TPC-H Q6: no join operator at all; every predicate pushed to the
    lineitem scan; single-row all-reduce aggregate."""
    plan = plan_of(spark, "h06_forecast_revenue")
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join_op not in plan
    fmt = formatted(spark, "h06_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in fmt and "LessThan(l_shipdate" in fmt


def test_h10_topk_and_broadcast_nation(spark):
    """TPC-H Q10 shape: ORDER BY + LIMIT 20 must plan TakeOrderedAndProject
    (per-partition heaps, no global sort) and nation must broadcast."""
    plan = plan_of(spark, "h10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_h13_left_join_preserved(spark):
    """TPC-H Q13 shape: the status exclusion lives in the join condition,
    so the customer-preserving LeftOuter must survive optimization (a
    WHERE would let Catalyst degrade it to inner), and both aggregation
    levels must partial-aggregate."""
    plan = plan_of(spark, "h13_customer_distribution")
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 4


def test_h16_anti_join_broadcast(spark):
    """TPC-H Q16 shape: the exclusion list must be a broadcast anti join
    (never a shuffle of lineitem against 100 suppliers), and the
    distinct-count must expand to a two-level aggregate."""
    plan = plan_of(spark, "h16_parts_supplier_counts")
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 3


def test_h19_disjunction_prefilters_part(spark):
    """TPC-H Q19: the OR-of-ANDs straddles the join, but Catalyst must
    still derive the part-side prefix (brand IN ... ∧ size bounds) and
    keep the join a broadcast hash join — no cartesian fallback."""
    plan = plan_of(spark, "h19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    fmt = formatted(spark, "h19_disjunctive_revenue")
    # Catalyst derives the part-only prefix of the OR and pushes the whole
    # disjunction (brand=..∧size≤..) into the part parquet scan
    assert "Or(Or(And(EqualTo(p_brand,Brand#12)" in fmt, (
        "derived brand/size disjunction not pushed to part scan"
    )


def test_ta08_chunking_mapside_only(spark):
    """Chunking must be pure map-side: explode + substring in codegen —
    no shuffle, no Python evaluation in the per-row path."""
    plan = plan_of(spark, "ta08_char_chunks")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_dd09_single_keyed_shuffle(spark):
    """Repeated-ngram detection: shingling stays map-side; the only
    exchanges belong to the ngram aggregation (distinct-count expansion),
    and nothing falls back to Python or a nested-loop join."""
    plan = plan_of(spark, "dd09_repeated_ngrams")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_sim06_broadcast_centroids_no_python(spark):
    """k-means step: the K-row centroid side must BROADCAST into the
    vector scan (a BroadcastNestedLoopJoin is correct for an unconditioned
    cross join with a tiny build side — what must never appear is a
    shuffled CartesianProduct), per-row distance math stays in codegen
    (no Python), and the cluster reduce partial-aggregates."""
    plan = plan_of(spark, "sim06_kmeans_step")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_h21_semi_and_anti_from_sql(spark):
    """TPC-H Q21 shape: Catalyst must rewrite EXISTS → LeftSemi and
    NOT EXISTS (with its correlated date predicate) → LeftAnti, keep every
    join a hash join, and plan the final top-20 without a global sort."""
    plan = plan_of(spark, "h21_waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dd10_both_probes_broadcast(spark):
    """Decontamination: the eval n-gram set and the contaminated-id set
    are both small by construction — each must broadcast (semi then anti);
    the corpus must never be the build side of a shuffled join."""
    plan = plan_of(spark, "dd10_decontaminate")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_cdc01_full_outer_merge_join(spark):
    """Snapshot diff: big-big full outer on the primary key must be a
    sort-merge join (neither snapshot broadcasts at scale), with the
    snapshot predicates pushed into both parquet scans."""
    plan = plan_of(spark, "cdc01_snapshot_diff")
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    fmt = formatted(spark, "cdc01_snapshot_diff")
    assert "PushedFilters" in fmt and "LessThanOrEqual(o_orderdate" in fmt


def test_scd01_single_window_shuffle(spark):
    """SCD2 build: exactly one user_id exchange feeding a single sorted
    window pass — no joins, no extra aggregation shuffles."""
    plan = plan_of(spark, "scd01_scd2_history")
    assert plan.count("Exchange") == 1
    assert "Window" in plan and "SortMergeJoin" not in plan


def test_ia01_delta_pruning_and_partial_agg(spark):
    """Incremental maintenance: both slices must push their date predicate
    into the scan (partition pruning at scale), aggregate with partial
    stages, and the state merge must involve no join."""
    fmt = formatted(spark, "ia01_incremental_agg")
    assert "LessThan(l_shipdate" in fmt and "GreaterThanOrEqual(l_shipdate" in fmt
    plan = plan_of(spark, "ia01_incremental_agg")
    assert plan.count("HashAggregate") >= 4  # partial+final per slice/merge
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_fe01_no_python_single_shuffle(spark):
    """Feature hashing: md5 bucketing stays JVM-side (no Python eval) and
    the whole op is one keyed exchange with map-side partial aggregation."""
    plan = plan_of(spark, "fe01_feature_hashing")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """With runtime bloom filters on and a selective predicate on one side
    of a big-big shuffle join, the probe side's scan stage must gain a
    might_contain filter (rows dropped BEFORE the shuffle) — and results
    must equal the unfiltered plan (bloom filters never false-negative)."""
    from pyspark.sql import functions as F

    from youtube_data_lakehouse_and_analysis_spark.catalog import load
    from youtube_data_lakehouse_and_analysis_spark.operators.runtime_filter import (
        enable_runtime_bloom,
        restore_confs,
    )

    prev = enable_runtime_bloom(spark)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        li = load(spark, SF_DIR, "lineitem")
        sel = load(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy().agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        with_bloom = j.collect()[0]["n"]
    finally:
        restore_confs(spark, prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)

    li = load(spark, SF_DIR, "lineitem")
    sel = load(spark, SF_DIR, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    plain = (
        li.join(sel, li.l_orderkey == sel.o_orderkey)
        .groupBy()
        .agg(F.count("*").alias("n"))
        .collect()[0]["n"]
    )
    assert with_bloom == plain


def test_ses01_single_exchange_drives_all(spark):
    """Sessionization: one user_id exchange must serve the lag window, the
    running-sum window, AND the per-session aggregation (partitioning on
    user_id satisfies (user_id, session_seq) clustering) — with one sort
    and map-side partial aggregation."""
    plan = plan_of(spark, "ses01_gap_sessions")
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 2 and plan.count("HashAggregate") >= 2


def test_dq01_shared_scans(spark):
    """Expectations: same-table checks must share one scan each (one agg
    pass per table + the FK anti join = at most 3 scans, not one per
    rule), and the FK check must project keys only before joining."""
    plan = plan_of(spark, "dq01_expectations")
    assert plan.count("FileScan parquet") <= 4  # orders agg, lineitem agg, FK probe+build
    assert "LeftAnti" in plan


def test_mg01_anti_join_broadcast_feed(spark):
    """MERGE application: the touched-key set (the feed) must broadcast
    into the anti join — the base snapshot is never shuffled."""
    plan = plan_of(spark, "mg01_apply_changes")
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "Union" in plan


def test_j16_lateral_decorrelates(spark):
    """Correlated LATERAL top-n: Catalyst must de-correlate to a window
    rank + one hash join — never a per-outer-row re-execution (which
    would surface as a nested-loop/cartesian plan)."""
    plan = plan_of(spark, "j16_lateral_topn")
    assert "Window" in plan and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_join_strategy_hints_honored(spark):
    """Join strategy hints are part of the tuning surface: SHUFFLE_HASH
    must produce a ShuffledHashJoin and MERGE a SortMergeJoin on the same
    query (broadcast disabled so the optimizer has a real choice)."""
    from pyspark.sql import functions as F

    from youtube_data_lakehouse_and_analysis_spark.catalog import load

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load(spark, SF_DIR, "lineitem")
        orders = load(spark, SF_DIR, "orders")
        sh = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        mg = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        assert "ShuffledHashJoin" in sh._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in mg._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sim03_no_nested_loop(spark):
    """sim03 pair generation must be the bucket equi-join, never the
    quadratic all-pairs BroadcastNestedLoopJoin it originally shipped."""
    plan = plan_of(spark, "sim03_pairwise_label_stats")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dd13_eval_dictionary_broadcast(spark):
    """dd13 contamination scoring: the benchmark-gram dictionary is
    bounded (benchmark-sized), so it must join broadcast — a shuffled
    join here would re-shuffle every training gram at 100 TB."""
    plan = plan_of(spark, "dd13_contamination_overlap")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sm05_rank_pushed_below_sort(spark):
    """sm05 per-source cap: Spark must plan the rn <= K filter as
    WindowGroupLimit (per-partition running top-K) so a mega-source
    never materializes beyond K rows past its sort."""
    plan = plan_of(spark, "sm05_per_source_cap")
    assert "WindowGroupLimit" in plan


def test_ta12_vocab_takeordered_and_broadcast(spark):
    """ta12 OOV rate: the top-K vocabulary must come from a K-bounded
    TakeOrdered (never a full corpus sort) and join broadcast."""
    plan = plan_of(spark, "ta12_oov_rate")
    assert "TakeOrdered" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q05_join_form_single_key_copartitioned(spark):
    """q05 (join form, r16): the join must stay keyed on l_orderkey
    ALONE (an equality filter above the join would be extracted as a
    composite (price, orderkey) join key, re-shuffling both sides —
    the >= form prevents that), run as a co-partitioned sort-merge
    join, and never broadcast the O(orders) per-order max table
    (impossible at 100 TB)."""
    df = QUERIES["q05_groupwise_max"](spark, SF_DIR)
    df.collect()  # AQE finalizes the physical plan on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin [l_orderkey" in final
    assert "knownfloatingpointnormalized" not in final  # no price join key
    assert "BroadcastHashJoin" not in final
    # one hash exchange per branch (agg's branch is 2-col-pruned, so the
    # branches cannot literally share); the third exchange is range sort
    assert final.count("Exchange hashpartitioning") == 2


def test_h03_h18_topk_and_single_shuffle(spark):
    """The new canonical TPC-H forms must keep the 100 TB plan shape:
    top-k via TakeOrderedAndProject (no global sort) and exactly ONE hash
    exchange (lineitem shuffles once; every dimension broadcasts)."""
    for name in (
        "h03_shipping_priority_topk",
        "h18_large_volume_topk",
    ):
        plan = plan_of(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "BroadcastHashJoin" in plan, name
        assert plan.count("Exchange hashpartitioning") == 1, name


def test_h05_h17_broadcast_single_shuffle(spark):
    """Q5's 6-table join and Q17's de-correlated average must broadcast
    all small sides around a single lineitem shuffle."""
    for name in ("h05_local_supplier_volume", "h17_small_qty_avg_yearly"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert plan.count("Exchange hashpartitioning") == 1, name


def test_pp01_pipeline_plan_shape(spark):
    """The composed corpus pipeline must keep its scale shape: both joins
    broadcast (no SortMergeJoin), exactly four hash exchanges — of which
    only two are corpus-sized (md5-dedup window, source-cap window); the
    other two repartition the benchmark-sized gram/id sets — and the
    per-source cap planned as WindowGroupLimit (rank pushed below sort)."""
    plan = plan_of(spark, "pp01_corpus_pipeline")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("Exchange hashpartitioning") == 4, plan.count(
        "Exchange hashpartitioning"
    )
    assert "WindowGroupLimit" in plan


def test_ev09_single_sequence_shuffle_and_topk(spark):
    """ev09: lead(1)/lead(2) share ONE user_id sort/shuffle; the path count
    aggregates combine-friendly; the top-10 is a heap, not a global sort."""
    plan = plan_of(spark, "ev09_path_trigrams")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") <= 2  # window shuffle + agg shuffle
    assert plan.count("Window") == 1  # both leads in one window frame


def test_dd17_bloom_probes_broadcast(spark):
    """dd17: the bit set, gram set, and both doc-flag sets are broadcast —
    the corpus side never sort-merge-shuffles for a membership probe."""
    plan = plan_of(spark, "dd17_bloom_decontaminate")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_ta16_map_side_only(spark):
    """ta16: 26 letter counters fold into ONE combine-friendly groupBy —
    a single exchange, no join, no Python, no per-char explode."""
    plan = plan_of(spark, "ta16_char_collision")
    assert plan.count("Exchange") == 1
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_dd19_no_self_join_single_exchange(spark):
    """dd19: sorted-neighborhood pairs come from window LEADs exploded in
    ONE pass — a single block-key exchange, a single Window, no join (the
    self-union form re-ran the scan+shuffle+window per branch)."""
    plan = plan_of(spark, "dd19_sorted_neighborhood")
    assert "Join" not in plan
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1


def test_mm05_single_key_shuffle_after_decode(spark):
    """mm05: one Arrow-batched pass then an 8-byte phash key aggregate —
    no join, no extra exchange beyond the groupBy (+AQE artifacts)."""
    plan = plan_of(spark, "mm05_phash_groups")
    assert "Join" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_sim10_multiprobe_broadcast_bucket_join(spark):
    """sim10: the probe fan-out explodes the QUERY side only, the bucket
    join is broadcast-hash, and nothing degrades to sort-merge or a
    nested loop on the approx side."""
    plan = plan_of(spark, "sim10_multiprobe_recall")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # bucket join + overlap semi-join


def test_ir02_takeordered_stats_broadcast_no_python(spark):
    """BM25 (ir02): scoring must stay a map-side projection — top-10 via
    per-partition heap, the 1-row corpus-stats join broadcast, no
    explode of the corpus, no Python."""
    plan = plan_of(spark, "ir02_bm25")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Generate" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_sim11_codebook_broadcast_no_smj(spark):
    """PQ (sim11): encode and ADC joins are against K-row broadcast
    tables — a SortMergeJoin would mean the codebook/lookup-table got
    shuffled like a fact."""
    plan = plan_of(spark, "sim11_pq_topk")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_dd20_char_windows_stay_jvm(spark):
    """Char-window dup mass (dd20): windowing is a JVM Generate (no
    Python), and the frequency join is an equi hash join on the window
    key."""
    plan = plan_of(spark, "dd20_char_window_dup_mass")
    assert "Generate" in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ta20_apply_side_no_explode(spark):
    """Merge-apply (ta20): the TRAINING side explodes bigrams, but the
    APPLY side must be chained replaces over a 1-row broadcast merge
    table — one Generate total (training), none re-exploding the applied
    corpus, and no Python."""
    plan = plan_of(spark, "ta20_merge_apply")
    assert plan.count("Generate") == 1
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_pd04_single_arrow_eval_node(spark):
    """mapInArrow (pd04): exactly one Python eval node, and it is the
    Arrow-map operator — no hidden per-row UDF fallback anywhere."""
    plan = plan_of(spark, "pd04_map_in_arrow")
    assert plan.count("MapInArrow") == 1
    assert "BatchEvalPython" not in plan


def test_gr03_edge_list_computed_once(spark):
    """Triangle counting (gr03): the checkpointed edge list must feed
    all branches — at most one lineitem⋈orders join subtree in the
    plan (the pre-checkpoint build), not one per count."""
    plan = plan_of(spark, "gr03_triangle_count")
    # the checkpointed RDD scan replaces the scan+join pipeline in every
    # consumer branch; only ExistingRDD scans remain
    assert plan.count("Scan ExistingRDD") >= 3
    assert "Scan parquet" not in plan


def test_dd21_pp02_checkpointed_legs(spark):
    """dd21/pp02: the multiply-consumed legs (truth/cand pair sets, the
    affinity table) must be checkpoint-fed, not recomputed per count
    branch — without it dd21's plan held 27 exchanges and pp02's 33."""
    p1 = plan_of(spark, "dd21_lsh_band_eval")
    assert "Scan ExistingRDD" in p1
    assert p1.count("Exchange") <= 10
    p2 = plan_of(spark, "pp02_llm_corpus_build")
    assert "Scan ExistingRDD" in p2
    assert p2.count("Exchange") <= 22


def test_sim12_broadcast_only_joins(spark):
    """IVF-PQ (sim12): codebook/lookup/mean tables are broadcast-sized;
    no fact-sized sort-merge join may appear."""
    plan = plan_of(spark, "sim12_ivfpq_topk")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_d_series_dim_broadcast_and_topk(spark):
    """Domain twins: the 25-row channel dim must broadcast (never a
    shuffle join against the derived video fact), and the LIMIT queries
    must plan as TakeOrderedAndProject, not a global sort."""
    for name in ("d03_top10_viewed", "d06_likes_top10", "d10_top10_commented"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "TakeOrderedAndProject" in plan, name
    p5 = plan_of(spark, "d05_most_liked_per_channel")
    assert "BroadcastHashJoin" in p5 and "SortMergeJoin" not in p5


def test_histogram_cdf_forms_broadcast_assignment(spark):
    """sm07a/w08a/ta19a: the cut-point table joins back onto the scores
    via broadcast — the fact side must never shuffle for the assignment."""
    for name in (
        "sm07a_histogram_cdf_sampling",
        "w08a_global_price_quartile",
        "ta19a_lm_gate_histogram",
    ):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_checkpointed_cdf_legs(spark):
    """sm07a/ta19a/ev10a: the multiply-consumed score/profile leg is
    checkpoint-fed (ExistingRDD scan present) so the fact is read once."""
    for name in (
        "sm07a_histogram_cdf_sampling",
        "ta19a_lm_gate_histogram",
        "ev10a_rfm_segments_approx",
    ):
        assert "Scan ExistingRDD" in plan_of(spark, name), name


def test_ia03_checkpointed_index(spark):
    """Incremental LSH maintenance: the band-key index is checkpoint-fed
    into every consumer (probe join, eval legs) — the signature build
    must not re-run per leg."""
    plan = plan_of(spark, "ia03_incremental_lsh_index")
    assert plan.count("Scan ExistingRDD") >= 3
    assert "BatchEvalPython" not in plan


def test_sim14_single_pass_no_joins(spark):
    """Index-balance eval: one embeddings scan unpivoted via stack(2, ...)
    plus combine-friendly aggs — no join of any kind."""
    plan = plan_of(spark, "sim14_index_balance")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoop"):
        assert j not in plan


def test_dedup_candidate_joins_stay_sort_merge(spark):
    """dd04/dd18/dd22: EVERY join in the prefix-filtered pair pipeline
    must be sort-merge — candidate legs, verify joins, the t≤1
    inverted-index leg, and the df-ranking join alike.

    r12 pinned only the double-exploded candidate legs (Catalyst
    size-estimates them from the tiny pre-explode array table and
    broadcasts an O(docs × combos) side — the measured sf1 OOM) and
    reasoned the remaining joins "keep scan-derived estimates and adapt
    on their own".  That reasoning was WRONG, and the longdocs x32 tier
    falsified it (r13): AQE's runtime broadcast conversion judges the
    post-shuffle side by COMPRESSED bytes, which undershoots the
    deserialized hash relation ~10-40× for shingle-array rows, so the
    verify join's array side (26 MB compressed / ~330 MB raw at 32k
    docs) was converted to broadcast and building two such relations
    concurrently exceeded the 8 GiB driver
    (notEnoughMemoryToBuildAndBroadcastTableError).  Every side in this
    pipeline is O(corpus); none is ever broadcastable, so the gate
    rejects ANY broadcast join node in these plans.

    The verify joins are strategy-BY-REGIME (operators/dedup.py
    _verified_overlaps, r13): discovery thresholds (τ ≥ 0.3: dd18,
    dd22) pin SHUFFLED-HASH with the array side as build — candidates
    stream unsorted and nothing is driver-sized — because sort-merge
    would sort, and shuffled-hash-with-candidate-shuffle did shuffle,
    the candidate×array intermediate (the τ=0.02 x16 re-measure filled
    a 250 GB disk under SMJ/heap under plain SHJ ordering).  Loose-τ
    verify (dd04, τ=0.02) BINDS the broadcast instead: the only shape
    whose candidate-side cost is O(pairs × 16 B), at the documented
    bounded-memory contract of the quadratic verify regime."""
    import re

    def counts(name):
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        # every aggregate in the pipeline must stay hash-based: the r14
        # struct-keyed form of the ≥2-distinct-keys spill filter fell
        # into SortAggregate (struct agg buffers leave HashAggregate's
        # fixed-width path), which sorts the quadratic spill-hits mass —
        # measured OOMing the longdocs x32/τ=0.1 audit.  The shipped
        # form aggregates component-wise longs precisely to stay here.
        assert "SortAggregate" not in plan, name
        assert "ObjectHashAggregate" not in plan, name
        assert len(re.findall(r"SortMergeJoin \[combo#", plan)) == 1, name
        # two spill legs: spill-probe vs all-t≥2 index, combo-probe vs
        # spill index
        assert len(re.findall(r"SortMergeJoin \[sh1#", plan)) == 2, name
        shj_a = len(re.findall(r"ShuffledHashJoin \[doc_a#\d+L\], \[doc_a#\d+L\], Inner, BuildRight", plan))
        shj_b = len(re.findall(r"ShuffledHashJoin \[doc_b#\d+L\], \[doc_b#\d+L\], Inner, BuildRight", plan))
        bc_a = len(re.findall(r"BroadcastHashJoin \[doc_a#\d+L\], \[doc_a#\d+L\], Inner, BuildRight", plan))
        bc_b = len(re.findall(r"BroadcastHashJoin \[doc_b#\d+L\], \[doc_b#\d+L\], Inner, BuildRight", plan))
        # no OTHER hash/broadcast joins beyond the two verify joins
        assert len(re.findall(r"ShuffledHashJoin", plan)) == shj_a + shj_b, name
        assert len(re.findall(r"BroadcastHashJoin", plan)) == bc_a + bc_b, name
        return shj_a, shj_b, bc_a, bc_b

    # discovery regime: streamed-hash verify, zero broadcasts
    for name in ("dd18_containment_pairs", "dd22_jaccard_pairs_strict"):
        assert counts(name) == (1, 1, 0, 0), name
    # loose-τ verify regime: bound broadcast verify, zero shuffled-hash
    assert counts("dd04_jaccard_pairs") == (0, 0, 1, 1)
