"""Deduplication queries (dd-series) over the `documents` table, each with
a DuckDB oracle that reproduces the md5-based hashing exactly (see
functions/text.py for the portability design).

Shared SQL fragments mirror functions/text.py::normalize_text / tokens /
word_shingles and operators/dedup.py shapes 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import checkpoint, load
from ..functions.text import sql_md5_prefix_long
from ..operators import dedup as D
from .queries import query

# DuckDB twins of normalize_text / tokens / word_shingles(k=3)
# trim's second arg pins ASCII-space-only trimming: DuckDB's 1-arg trim
# strips Unicode spaces (e.g. U+3000) while Spark's trim is ASCII-only,
# and the engine's normalize_text (functions/text.py) is the contract
# (see TESTDATA.md "Unicode contract").
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')"
_TOKS_CTE = f"""
norm AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), x -> x <> '') AS toks
  FROM documents
)"""
_SHING_CTE = f"""{_TOKS_CTE},
shing AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                     THEN list_distinct(list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' ')))
                     ELSE [array_to_string(toks, ' ')] END) AS shingle
  FROM norm
)"""
def _sig_cte() -> str:
    """DuckDB twin of operators/dedup.minhash_signatures: one md5-prefix
    base hash per shingle, 16 multiply-shift mixes (identical literals)."""
    from ..functions.text import sql_md5_prefix_long
    from ..operators.dedup import MINHASH_MOD, minhash_coeffs

    mixes = " UNION ALL ".join(
        f"SELECT doc_id, CAST({i} AS BIGINT) AS seed, "
        f"min(({a} * h + {b}) % {MINHASH_MOD}) AS minhash FROM hashed GROUP BY doc_id"
        for i, (a, b) in enumerate(minhash_coeffs(16))
    )
    return f"""{_SHING_CTE},
hashed AS (
  SELECT doc_id, {sql_md5_prefix_long('shingle', 15)} % {MINHASH_MOD} AS h FROM shing
),
sig AS ({mixes})"""


_SIG_CTE = _sig_cte()

_CAP = D.DEFAULT_MAX_BUCKET_WIDTH  # hot-bucket cap, shared with the Spark side


def capped_pairs_subquery(cap: int = _CAP) -> str:
    """Self-contained DuckDB subquery yielding the CAPPED LSH candidate
    pairs (doc_a, doc_b) — dd12 semantics, the default for every
    discovery pipeline: all-pairs within buckets of width <= cap, star
    pairs (hub = min doc_id) beyond.  Uncapped discovery is the known
    100 TB skew bomb (one boilerplate bucket of width W emits W(W-1)/2
    pairs); only dd03 keeps the uncapped form, as the definitional
    primitive."""
    return f"""(
        WITH {_SIG_CTE},
        bandkey AS (
          SELECT doc_id, seed // 4 AS band,
                 md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
          FROM sig GROUP BY doc_id, seed // 4),
        stats AS (
          SELECT band, band_key, COUNT(*) AS width, MIN(doc_id) AS hub
          FROM bandkey GROUP BY band, band_key),
        keyed AS (
          SELECT bk.doc_id, bk.band, bk.band_key, s.width, s.hub
          FROM bandkey bk JOIN stats s USING (band, band_key)),
        narrow AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM keyed a
          JOIN keyed b ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id
          WHERE a.width <= {cap}),
        star AS (
          SELECT hub AS doc_a, doc_id AS doc_b FROM keyed
          WHERE width > {cap} AND doc_id <> hub)
        SELECT DISTINCT doc_a, doc_b
        FROM (SELECT * FROM narrow UNION ALL SELECT * FROM star) u)"""


@query(
    "dd01_exact_dedup",
    f"""SELECT md5({_NORM}) AS text_hash, MIN(doc_id) AS canonical_doc_id,
               COUNT(*) AS n_docs
        FROM documents GROUP BY md5({_NORM})""",
)
def dd01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text (hash-groupBy; the 100 TB workhorse)."""
    return D.exact_duplicates(load(spark, sf_dir, "documents"))


@query(
    "dd02_minhash_signatures",
    f"""WITH {_SIG_CTE}
        SELECT doc_id, CAST(seed AS BIGINT) AS seed, minhash FROM sig""",
)
def dd02_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form MinHash signatures (16 hashes/doc) — the building block of
    fuzzy dedup, oracle-reproducible because the hash family is keyed md5."""
    sigs = D.minhash_signatures(load(spark, sf_dir, "documents"), num_hashes=16)
    return sigs.withColumn("seed", sigs["seed"].cast("long"))


@query(
    "dd03_lsh_candidate_pairs",
    f"""WITH {_SIG_CTE},
        bandkey AS (
          SELECT doc_id, seed // 4 AS band,
                 md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
          FROM sig GROUP BY doc_id, seed // 4
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bandkey a
        JOIN bandkey b ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id""",
)
def dd03_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 4 bands × 4 rows. Bucket-join — the
    scale path that avoids the quadratic all-pairs comparison."""
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, num_hashes=16)
    return D.lsh_candidate_pairs(D.lsh_band_keys(sigs, rows_per_band=4))


@query(
    "dd12_lsh_capped_pairs",
    f"""WITH {_SIG_CTE},
        bandkey AS (
          SELECT doc_id, seed // 4 AS band,
                 md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
          FROM sig GROUP BY doc_id, seed // 4
        ),
        stats AS (
          SELECT band, band_key, COUNT(*) AS width, MIN(doc_id) AS hub
          FROM bandkey GROUP BY band, band_key
        ),
        keyed AS (
          SELECT bk.doc_id, bk.band, bk.band_key, s.width, s.hub
          FROM bandkey bk JOIN stats s USING (band, band_key)
        ),
        narrow AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM keyed a
          JOIN keyed b ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id
          WHERE a.width <= {_CAP}
        ),
        star AS (
          SELECT hub AS doc_a, doc_id AS doc_b FROM keyed
          WHERE width > {_CAP} AND doc_id <> hub
        )
        SELECT DISTINCT doc_a, doc_b
        FROM (SELECT * FROM narrow UNION ALL SELECT * FROM star) u""",
)
def dd12_lsh_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs with the hot-bucket cap active: buckets wider
    than _CAP (10) docs emit star pairs (member ↔ min-id hub) instead of all
    pairs, bounding output linearly in bucket width.  This is the 100 TB
    guard against boilerplate skew — a million pages sharing a banner
    would otherwise emit ~5·10^11 pairs from one bucket."""
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, num_hashes=16)
    return D.lsh_candidate_pairs(D.lsh_band_keys(sigs, rows_per_band=4), max_bucket_width=_CAP)


@query(
    "dd04_jaccard_pairs",
    f"""WITH {_SHING_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shing GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM shing a JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        FROM common
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.02""",
)
def dd04_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity ≥ 0.02 over pairs sharing a shingle
    — the verification stage for LSH candidates (quadratic; never the
    discovery stage at 100 TB)."""
    return D.jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.02)


@query(
    "dd22_jaccard_pairs_strict",
    f"""WITH {_SHING_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shing GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM shing a JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        FROM common
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5""",
)
def dd22_jaccard_pairs_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard ≥ 0.5 — near-dup DISCOVERY at the threshold
    the prefix-filtered machinery is designed for (r12).  Same operator
    as dd04, different regime: at τ = 0.5 the probe prefix keeps n/3 + 2
    shingles and the symmetric index prefix n/2 + 2, so candidate volume
    tracks the true near-dup density instead of Σ df(s)² — measured
    near-linear on the longdocs tiers (tools/scaling_audit.py
    --longdocs), where dd04's τ = 0.02 verification shape is measurably
    quadratic (exponent ≈ 1.9 at the x16 doubling, its documented
    anti-pattern).  This is the pair the audit gates: loose-τ verify may
    be quadratic on a bounded candidate set; discovery-τ must scale."""
    return D.jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.5)


@query(
    "dd05_simhash",
    f"""WITH {_TOKS_CTE},
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM norm),
        toksh AS (SELECT doc_id, {sql_md5_prefix_long('tok')} AS h FROM tok),
        votes AS (
          SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS vote
          FROM toksh CROSS JOIN (SELECT unnest(range(32)) AS b) bits
          GROUP BY doc_id, b
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id""",
)
def dd05_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (token-multiplicity majority vote);
    near-dups differ in few bits. Integer-only math → portable oracle."""
    return D.simhash(load(spark, sf_dir, "documents"), bits=32)


@query(
    "dd07_dup_clusters",
    f"""WITH RECURSIVE
        pairs AS (
          SELECT doc_a, doc_b FROM {capped_pairs_subquery()} t
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs
          UNION SELECT doc_a, doc_a FROM pairs
          UNION SELECT doc_b, doc_b FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id, MIN(b) AS cluster_id,
               COUNT(DISTINCT b) AS cluster_size
        FROM reach GROUP BY a""",
)
def dd07_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the LSH candidate pairs: connected components
    via iterative min-label propagation (operators/cluster.py), then the
    canonical id (= min member) and component size per doc. The oracle
    computes the same closure with a recursive CTE — feasible only at test
    scale; the iterative join IS the 100 TB path.  Candidate discovery
    runs with the default hot-bucket cap (star pairs keep wide buckets
    connected, so the components are unchanged)."""
    from ..operators.cluster import connected_components

    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, num_hashes=16)
    pairs = D.lsh_candidate_pairs(D.lsh_band_keys(sigs, rows_per_band=4), max_bucket_width=_CAP)
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, on="component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# dd11 — edit-distance verification of LSH candidate pairs
# ---------------------------------------------------------------------------

_ED_PREFIX = 200  # verify on a fixed prefix: O(P^2) DP per pair, bounded


@query(
    "dd11_edit_distance_verify",
    f"""WITH cand AS (
          SELECT doc_a, doc_b FROM {capped_pairs_subquery()} t)
        SELECT c.doc_a, c.doc_b,
               levenshtein(substring(da.text, 1, {_ED_PREFIX}),
                           substring(db.text, 1, {_ED_PREFIX})) AS edit_dist,
               (levenshtein(substring(da.text, 1, {_ED_PREFIX}),
                            substring(db.text, 1, {_ED_PREFIX})) * 10
                  <= {_ED_PREFIX}) AS is_dup
        FROM cand c
        JOIN documents da ON da.doc_id = c.doc_a
        JOIN documents db ON db.doc_id = c.doc_b""",
)
def dd11_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-verification stage that closes the fuzzy-dedup pipeline:
    LSH candidate pairs (dd03's plan) are re-checked with a real edit
    distance on a 200-char prefix; a pair is confirmed when the distance
    is ≤ 10% of the prefix (cross-multiplied — no division). MinHash
    banding RECALLS candidates cheaply; this stage buys PRECISION with
    O(P²) work on only the surviving pairs.

    Scale: the candidate set is ~(true dups + banding false positives) —
    orders of magnitude smaller than all-pairs — so the two text lookups
    are key joins against the corpus and the DP cost is bounded by the
    fixed prefix. At 100 TB the prefix join pulls only the text column,
    and a longer confirmation (full-text, token-level) runs on the
    handful of pairs this stage still leaves uncertain."""
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, num_hashes=16)
    cand = D.lsh_candidate_pairs(D.lsh_band_keys(sigs, rows_per_band=4), max_bucket_width=_CAP)
    da = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, _ED_PREFIX).alias("ta"),
    )
    db = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, _ED_PREFIX).alias("tb"),
    )
    dist = F.levenshtein("ta", "tb")
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.alias("edit_dist"),
            (dist * 10 <= F.lit(_ED_PREFIX)).alias("is_dup"),
        )
    )


@query(
    "dd18_containment_pairs",
    f"""WITH {_SHING_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shing GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM shing a JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(n_common AS DOUBLE) / least(sa.n, sb.n) AS containment,
               CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        FROM common
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / least(sa.n, sb.n) >= 0.3""",
)
def dd18_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment ≥ 0.3 with Jaccard alongside — catches the
    quote/subset duplicates (short doc embedded in a long one) that a
    Jaccard threshold misses. On THIS synthetic corpus every
    high-containment pair is also high-Jaccard (no partial embeddings in
    the generator) — the dual-column output is what makes that checkable
    rather than assumed. Verify-stage contract, like dd04: runs on
    shingle-sharing candidates, never as all-pairs discovery."""
    return D.containment_pairs(load(spark, sf_dir, "documents"), threshold=0.3)


@query(
    "dd19_sorted_neighborhood",
    f"""WITH keyed AS (
          SELECT doc_id, {_NORM} AS t, substring({_NORM}, 1, 16) AS block
          FROM documents),
        ordered AS (
          SELECT doc_id, t, block,
                 LEAD(doc_id, 1) OVER w AS n1, LEAD(t, 1) OVER w AS t1,
                 LEAD(doc_id, 2) OVER w AS n2, LEAD(t, 2) OVER w AS t2
          FROM keyed
          WINDOW w AS (PARTITION BY block ORDER BY t, doc_id)),
        pairs AS (
          SELECT block, doc_id AS doc_a, n1 AS doc_b,
                 CASE WHEN t = t1 THEN 1 ELSE 0 END AS exact_dup
          FROM ordered WHERE n1 IS NOT NULL
          UNION ALL
          SELECT block, doc_id, n2, CASE WHEN t = t2 THEN 1 ELSE 0 END
          FROM ordered WHERE n2 IS NOT NULL)
        SELECT block, doc_a, doc_b, exact_dup FROM pairs""",
)
def dd19_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate generation (the classic
    entity-resolution blocking alternative to LSH bands and SimHash
    blocks): documents sort by normalized text inside a 16-char-prefix
    block, and each doc pairs with its next 2 neighbors in sort order —
    near-duplicates share prefixes, so they sort adjacently and are
    caught with a LINEAR number of pairs (≤ (w−1)·N total, vs bucket-
    width-squared for uncapped LSH). The exact_dup flag marks pairs with
    identical normalized bodies — the planted-duplicate sanity signal.

    Scale: one shuffle on the block key + an in-block sort; every block
    sorts independently, so 100 TB partitions by prefix with AQE skew
    splitting hot prefixes (boilerplate openings). The standard
    multi-pass variant re-runs with a second key (e.g. reversed text) to
    catch near-dups whose difference is in the first window — each pass
    is this same one-shuffle plan. Window-function LEADs keep the pair
    generation inside codegen; no self-join at all."""
    from ..functions.text import normalize_text

    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        normalize_text("text").alias("t"),
        F.substring(normalize_text("text"), 1, 16).alias("block"),
    )
    w = Window.partitionBy("block").orderBy("t", "doc_id")
    ordered = keyed.select(
        "doc_id",
        "t",
        "block",
        F.lead("doc_id", 1).over(w).alias("n1"),
        F.lead("t", 1).over(w).alias("t1"),
        F.lead("doc_id", 2).over(w).alias("n2"),
        F.lead("t", 2).over(w).alias("t2"),
    )
    # Both window-offset pairs emit from ONE pass: a self-union of two
    # filtered projections would re-run the scan + block shuffle + window
    # per branch (the plan showed 2 exchanges / 2 Windows); the explode
    # keeps one of each and is pinned in tests/test_plans.py.
    neighbor = F.explode(
        F.array(
            F.struct(F.col("n1").alias("nb"), F.col("t1").alias("tb")),
            F.struct(F.col("n2").alias("nb"), F.col("t2").alias("tb")),
        )
    )
    return (
        ordered.select("block", "doc_id", "t", neighbor.alias("x"))
        .filter(F.col("x.nb").isNotNull())
        .select(
            "block",
            F.col("doc_id").alias("doc_a"),
            F.col("x.nb").alias("doc_b"),
            F.when(F.col("t") == F.col("x.tb"), 1).otherwise(0).alias("exact_dup"),
        )
    )


# ---------------------------------------------------------------------------
# ia03 — incremental LSH-index maintenance (the daily-crawl-increment form)
# ---------------------------------------------------------------------------


def _ia03_sql() -> str:
    delta = f"{sql_md5_prefix_long('CAST(doc_id AS VARCHAR)')} % 10 = 0"
    da = f"{sql_md5_prefix_long('CAST(doc_a AS VARCHAR)')} % 10 = 0"
    db = f"{sql_md5_prefix_long('CAST(doc_b AS VARCHAR)')} % 10 = 0"
    return f"""WITH {_SIG_CTE},
        bandkey AS (
          SELECT doc_id, seed // 4 AS band,
                 md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
          FROM sig GROUP BY doc_id, seed // 4),
        tagged AS (
          SELECT doc_id, band, band_key,
                 CASE WHEN {delta} THEN 1 ELSE 0 END AS is_delta
          FROM bandkey),
        inc AS (
          SELECT DISTINCT LEAST(d.doc_id, o.doc_id) AS doc_a,
                          GREATEST(d.doc_id, o.doc_id) AS doc_b
          FROM tagged d JOIN tagged o
            ON d.band = o.band AND d.band_key = o.band_key
           AND d.doc_id <> o.doc_id
          WHERE d.is_delta = 1),
        full_r AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM tagged a JOIN tagged b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
          WHERE a.is_delta = 1 OR b.is_delta = 1),
        cat AS (
          SELECT doc_a, doc_b,
                 (CASE WHEN {da} THEN 1 ELSE 0 END)
                 + (CASE WHEN {db} THEN 1 ELSE 0 END) AS nd
          FROM inc)
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE {delta}) AS n_delta_docs,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE NOT ({delta})) AS n_base_docs,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM cat) AS n_new_pairs,
          (SELECT CAST(COALESCE(SUM(CASE WHEN nd = 2 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM cat) AS n_delta_delta_pairs,
          (SELECT CAST(COALESCE(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM cat) AS n_delta_base_pairs,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM full_r f
           WHERE NOT EXISTS (SELECT 1 FROM inc i
                             WHERE i.doc_a = f.doc_a AND i.doc_b = f.doc_b)) AS n_missing_vs_full,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM inc i
           WHERE NOT EXISTS (SELECT 1 FROM full_r f
                             WHERE f.doc_a = i.doc_a AND f.doc_b = i.doc_b)) AS n_extra_vs_full"""


@query("ia03_incremental_lsh_index", _ia03_sql())
def ia03_incremental_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH index maintenance — the ia01/ia02
    merge==recompute discipline applied to the dedup index.  A daily
    crawl increment must NOT re-dedup the whole corpus: the new docs'
    band keys (here: the deterministic ~10% doc_id-hash slice plays the
    delta) are computed from the DELTA TEXT ONLY and probed against the
    stored band-key index; new candidate pairs are (delta×base sharing a
    bucket) ∪ (delta×delta).  The query PROVES the maintenance identity
    inline: the incremental pair set equals the full recompute's pair
    set restricted to delta-involving pairs — n_missing_vs_full and
    n_extra_vs_full are both 0 by construction, and the oracle checks
    the claim on both engines.

    Scale: at 100 TB the base index is a materialized (band, band_key,
    doc_id) table bucketed on the key; the increment costs
    O(|delta| · bands) shuffle + one bucket-local probe join — the full
    self-join never re-runs.  Uncapped in-bucket pairing here (the dd03
    definitional form); production applies the dd12 width cap to the
    probe side identically.  The full-recompute leg exists only for the
    eval, as everywhere (ia01/sim13/dd21)."""
    from ..functions.text import md5_prefix_long

    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, num_hashes=16)

    def delta_flag(col):
        return (md5_prefix_long(col.cast("string")) % 10 == 0).cast("int")

    # the "stored index": consumed by the probe join (twice) and the
    # full-recompute eval leg (twice)
    tagged = (
        D.lsh_band_keys(sigs, rows_per_band=4)
        .withColumn("is_delta", delta_flag(F.col("doc_id")))
        .transform(checkpoint)
    )
    d = tagged.filter(F.col("is_delta") == 1).select(
        "band", "band_key", F.col("doc_id").alias("d_id")
    )
    o = tagged.select("band", "band_key", F.col("doc_id").alias("o_id"))
    inc = (
        d.join(o, ["band", "band_key"])
        .filter(F.col("d_id") != F.col("o_id"))
        .select(
            F.least("d_id", "o_id").alias("doc_a"),
            F.greatest("d_id", "o_id").alias("doc_b"),
        )
        .distinct()
        .transform(checkpoint)  # stats leg + the extra-vs-full anti-join
    )
    a = tagged.select("band", "band_key", F.col("doc_id").alias("a_id"), "is_delta")
    b = tagged.select(
        "band", "band_key", F.col("doc_id").alias("b_id"),
        F.col("is_delta").alias("is_delta_b"),
    )
    full_r = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter((F.col("is_delta") == 1) | (F.col("is_delta_b") == 1))
        .select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
        .distinct()
        .transform(checkpoint)  # missing-vs-full leg + extra leg's right side
    )
    nd = delta_flag(F.col("doc_a")) + delta_flag(F.col("doc_b"))
    # COALESCE the sums: an empty increment (no new near-dups today) must
    # report 0/0, not NULL/NULL (both engines agree on NULL, so the oracle
    # alone would not catch it — the ta20 lesson)
    pair_stats = inc.select(nd.alias("nd")).agg(
        F.count("*").alias("n_new_pairs"),
        F.coalesce(F.sum((F.col("nd") == 2).cast("long")), F.lit(0)).alias("n_delta_delta_pairs"),
        F.coalesce(F.sum((F.col("nd") == 1).cast("long")), F.lit(0)).alias("n_delta_base_pairs"),
    )
    doc_stats = docs.select(delta_flag(F.col("doc_id")).alias("fd")).agg(
        F.sum("fd").alias("n_delta_docs"),
        F.sum(1 - F.col("fd")).alias("n_delta_docs_neg"),
    ).select(
        "n_delta_docs", F.col("n_delta_docs_neg").alias("n_base_docs")
    )
    missing = full_r.join(inc, ["doc_a", "doc_b"], "left_anti").agg(
        F.count("*").alias("n_missing_vs_full")
    )
    extra = inc.join(full_r, ["doc_a", "doc_b"], "left_anti").agg(
        F.count("*").alias("n_extra_vs_full")
    )
    return (
        doc_stats.crossJoin(pair_stats)
        .crossJoin(missing)
        .crossJoin(extra)
        .select(
            "n_delta_docs", "n_base_docs", "n_new_pairs",
            "n_delta_delta_pairs", "n_delta_base_pairs",
            "n_missing_vs_full", "n_extra_vs_full",
        )
    )
