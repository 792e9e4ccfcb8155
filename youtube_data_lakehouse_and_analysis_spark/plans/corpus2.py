"""Training-data pipeline operators, batch 3: eval-set decontamination,
sensitive-term redaction, and inverted-index retrieval.

  dd10 — benchmark decontamination: drop every training document that
         shares a word 5-gram with the held-out eval set (the GPT-3/Llama
         n-gram-overlap decontamination step)
  ta09 — global pattern redaction with an audit count (the PII-scrub
         shape: regexp_replace everywhere + how many spans were hit; the
         synthetic corpus has no real PII, so a fixed sensitive-term list
         stands in — the plan shape is identical)
  ir01 — per-term top-k postings by term frequency (the inverted-index /
         keyword-retrieval primitive under BM25-style rankers)

The reference has no corpus ops (SURVEY §2.11: zero UDFs; its text columns
pass through untouched, app.py:322-389) — this family is part of the
100 TB extension surface, expressed entirely in JVM built-ins.

Determinism: membership decisions are exact string-set intersections;
counts are integers; every top-k sits under a (tf DESC, doc_id ASC) total
order; document text is surfaced as md5 only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .queries import query

# ---------------------------------------------------------------------------
# dd10 — benchmark decontamination (word 5-gram overlap with a held-out set)
# ---------------------------------------------------------------------------

_N = 5  # 5-word shingles: long enough to mean "copied span", short enough
#         to catch partial overlap (char-13-gram analogue on word text)
_BENCH_MOD = 29  # doc_id % 29 == 0 plays the held-out eval set


def _word_ngrams(docs: DataFrame, n: int) -> DataFrame:
    ws = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= n)
        .select("doc_id", F.explode(F.sequence(F.lit(0), F.size("ws") - n)).alias("i"), "ws")
        .select(
            "doc_id",
            F.array_join(F.slice(F.col("ws"), F.col("i") + 1, n), " ").alias("ngram"),
        )
    )


@query(
    "dd10_decontaminate",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id,
                     array_to_string(list_slice(ws, i + 1, i + {_N}), ' ') AS ngram
              FROM w, UNNEST(range(0, len(ws) - {_N} + 1)) AS t(i)
              WHERE len(ws) >= {_N}),
        bench AS (SELECT DISTINCT ngram FROM g WHERE doc_id % {_BENCH_MOD} = 0),
        contaminated AS (SELECT DISTINCT doc_id FROM g
                         WHERE doc_id % {_BENCH_MOD} <> 0
                           AND ngram IN (SELECT ngram FROM bench))
        SELECT d.doc_id, md5(d.text) AS text_md5
        FROM documents d
        WHERE d.doc_id % {_BENCH_MOD} <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)""",
)
def dd10_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: the training split is every doc with
    doc_id % 29 != 0; drop any of them sharing a word 5-gram with the
    held-out split (doc_id % 29 == 0). Two set-membership joins, both
    against small sides.

    Scale: shingling is map-side; the eval set is tiny by construction
    (benchmarks are ~1e5 docs vs 1e9 training docs), so its distinct
    n-gram set broadcasts — the contamination probe is a broadcast
    LEFT SEMI that never shuffles the corpus. The contaminated-id set
    (smaller still) broadcasts into a LEFT ANTI. At 100 TB carry
    xxhash64(ngram) instead of the string (8 bytes/row in the broadcast)
    — exact-match semantics survive hashing up to 2^-64 collisions."""
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    grams = _word_ngrams(docs, _N)
    bench_grams = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select("ngram").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench_grams), "ngram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return train.join(F.broadcast(contaminated), "doc_id", "left_anti").select(
        "doc_id", F.md5("text").alias("text_md5")
    )


# ---------------------------------------------------------------------------
# ta09 — global pattern redaction with audit count (the PII-scrub shape)
# ---------------------------------------------------------------------------

_REDACT_RE = r"\b(customer|supplier|account)\b"


@query(
    "ta09_redact_terms",
    f"""SELECT doc_id,
               md5(regexp_replace(text, '{_REDACT_RE}', '[X]', 'g')) AS redacted_md5,
               CAST(len(regexp_extract_all(text, '{_REDACT_RE}', 0)) AS BIGINT)
                 AS n_redactions
        FROM documents""",
)
def ta09_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub a sensitive-term list from every document and report how many
    spans were hit (the audit trail a PII pipeline keeps). Spark's
    regexp_replace is global by default = DuckDB's 'g' flag; both RE2 and
    Java regex agree on \\b word boundaries and alternation groups.

    Scale: pure map-side (zero shuffles — a projection over the scan
    inside one codegen stage); at 100 TB this runs at scan speed. Real
    PII regexes (emails, phone numbers, SSNs) drop in by swapping the
    pattern; entity-model NER would move to a mapInPandas stage like
    mm02's decode."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace("text", _REDACT_RE, "[X]")).alias("redacted_md5"),
        F.size(F.regexp_extract_all("text", F.lit(_REDACT_RE), 0))
        .cast("long")
        .alias("n_redactions"),
    )


# ---------------------------------------------------------------------------
# ir01 — inverted-index postings: per-term top-k documents by tf
# ---------------------------------------------------------------------------

_TERMS = ("data", "query", "join")
_TOPK = 10


@query(
    "ir01_keyword_topk",
    f"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                     FROM documents),
        tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok
               WHERE term IN {_TERMS!r}
               GROUP BY term, doc_id),
        ranked AS (SELECT term, doc_id, tf,
                          ROW_NUMBER() OVER (PARTITION BY term
                                             ORDER BY tf DESC, doc_id) AS rnk
                   FROM tf)
        SELECT term, doc_id, tf, rnk FROM ranked WHERE rnk <= {_TOPK}""",
)
def ir01_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k posting list per query term, ranked by raw term frequency
    with doc_id as the total-order tiebreak — the retrieval primitive a
    BM25 ranker refines (BM25's idf/length terms need floating log, which
    cross-engine hashing can't pin; the candidate-selection plan is
    identical).

    Scale: the WHERE term IN (...) filter lands *before* the explode's
    output is shuffled, so only matching tokens (a few % of the corpus)
    reach the groupBy; the per-term window is k-bounded. At 100 TB,
    building the full index (no term filter) is the same plan partitioned
    by term — power-law terms need AQE skew splitting, and rank windows
    over mega-terms become per-partition top-k (w01's pattern)."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(*_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return tf.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= _TOPK)


# ---------------------------------------------------------------------------
# fe01 — hashing-trick featurization (sparse bag-of-words vectors)
# ---------------------------------------------------------------------------

_N_BUCKETS = 64


@query(
    "fe01_feature_hashing",
    f"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                     FROM documents)
        SELECT doc_id,
               CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT)
                 % {_N_BUCKETS} AS bucket,
               COUNT(*) AS cnt
        FROM tok GROUP BY doc_id, bucket""",
)
def fe01_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: every token maps to one of 64 buckets
    via md5 (engine-portable), yielding the sparse (doc, bucket, count)
    bag-of-words representation a downstream trainer consumes — no
    vocabulary table, no OOV handling, memory fixed by the bucket count.

    Scale: vocabulary-free means no dictionary broadcast and no global
    distinct pass — the whole op is explode + one combine-friendly
    groupBy keyed (doc_id, bucket), which partial-aggregates map-side
    because tokens repeat within a document. Bucket count trades
    collision rate for width; at 100 TB the same plan holds with 2^18+
    buckets (the key stays 16 bytes)."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("bigint")
        % _N_BUCKETS
    )
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# ta10 — BPE merge-pair statistic: top adjacent-pair counts
# ---------------------------------------------------------------------------

_PAIR_TOPK = 50


@query(
    "ta10_merge_pairs",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        pairs AS (SELECT ws[i + 1] || ' ' || ws[i + 2] AS pair
                  FROM w, UNNEST(range(0, len(ws) - 1)) AS t(i)
                  WHERE len(ws) >= 2),
        counted AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair)
        SELECT pair, n FROM counted
        ORDER BY n DESC, pair LIMIT {_PAIR_TOPK}""",
)
def ta10_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-selection statistic: count every ADJACENT symbol pair
    across the corpus and take the top-k — each BPE training iteration
    merges the argmax of exactly this table (here at word granularity;
    byte/char granularity is the same plan over a different split).

    Scale: pair generation is map-side; one shuffle groups by pair with
    map-side combine (pair frequency is power-law, so partial aggregation
    absorbs most of the volume before the exchange); the top-k is
    TakeOrderedAndProject under a (count DESC, pair) total order. A full
    BPE trainer iterates: apply the merge (map-side regexp), recount —
    each iteration is this same one-shuffle job."""
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    pairs = (
        docs.select(ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(F.explode(F.sequence(F.lit(0), F.size("ws") - 2)).alias("i"), "ws")
        .select(
            F.concat_ws(
                " ",
                F.element_at("ws", F.col("i") + 1),
                F.element_at("ws", F.col("i") + 2),
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_PAIR_TOPK)
    )


# ---------------------------------------------------------------------------
# sm04 — domain-mixture sampling: per-language keep rates by content hash
# ---------------------------------------------------------------------------

# keep 1/D of each language's documents (DoReMi-style static mixture
# reweighting): en all, de/fr half, es quarter, zh eighth.
_MIX_DENOM = {"en": 1, "de": 2, "fr": 2, "es": 4, "zh": 8}


@query(
    "sm04_source_mixing",
    """WITH h AS (SELECT doc_id, lang,
                         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) AS hv
                  FROM documents)
       SELECT doc_id, lang FROM h
       WHERE hv % (CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'fr' THEN 2
                             WHEN 'es' THEN 4 WHEN 'zh' THEN 8 ELSE 1 END) = 0""",
)
def sm04_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static domain-mixture sampling: each language keeps a configured
    1/D of its documents, decided by content hash (md5(doc_id) mod D) —
    the reweighting step that shapes a training mixture (keep all English,
    half German/French, a quarter Spanish, an eighth Chinese here).
    Hash-based keep decisions are reproducible across runs, engines, and
    partitionings — unlike rand()-based sampling, which none of this
    repo's operators use.

    Scale: stateless map-side filter at scan speed; changing the mixture
    re-runs only this filter, never a shuffle. Rates finer than 1/D come
    from `hv % 2^k < m` thresholds; dynamic mixtures (DoReMi proper)
    re-derive D from a small per-domain weight table broadcast into the
    same expression."""
    docs = load(spark, sf_dir, "documents")
    hv = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    denom = F.when(F.col("lang") == "en", 1)
    for lang, d in list(_MIX_DENOM.items())[1:]:
        denom = denom.when(F.col("lang") == lang, d)
    return docs.select("doc_id", "lang", hv.alias("hv")).filter(
        F.col("hv") % denom.otherwise(1) == 0
    ).select("doc_id", "lang")
