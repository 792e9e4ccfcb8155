"""Training-data pipeline operators, batch 2: the corpus-preparation steps
between "raw crawl" and "training shards" that aren't dedup or similarity
(those live in plans/dedup.py / plans/similarity.py):

  dd09 — repeated n-gram spans across documents (the detector feeding
         repeated-span removal, à la dedup of boilerplate in RefinedWeb/C4)
  ta07 — heuristic quality filtering (Gopher/C4-style document stats with
         an integer-exact keep decision)
  ta08 — character-window chunking with overlap (context-length shaping)
  sm03 — deterministic train/val/test split assignment by content hash

The synthetic documents are single-line space-separated word text (no
newlines, no digits), so the line-level variants of these ops are expressed
at word/character granularity; the Spark shapes are identical.

Determinism: all keep/assign decisions are integer comparisons
(cross-multiplied ratios) or md5-derived buckets — no doubles decide any
row set. Chunk text is surfaced as md5, not raw, to keep result rows small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import bind, char_array
from ..catalog import load
from .queries import query

# ---------------------------------------------------------------------------
# dd09 — repeated n-gram spans across documents
# ---------------------------------------------------------------------------

_N = 4  # n-gram width; ≥3-doc 4-grams are non-trivial on the synthetic corpus


@query(
    "dd09_repeated_ngrams",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id,
                     array_to_string(list_slice(ws, i + 1, i + {_N}), ' ') AS ngram
              FROM w, UNNEST(range(0, len(ws) - {_N} + 1)) AS t(i)
              WHERE len(ws) >= {_N})
        SELECT ngram,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences
        FROM g GROUP BY ngram
        HAVING COUNT(DISTINCT doc_id) >= 3""",
)
def dd09_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: every word 4-gram that occurs in at
    least 3 distinct documents, with its document- and occurrence-counts.
    This is the boilerplate/repetition detector a span-removal pass
    consumes — the word-granularity analogue of repeated-line dedup
    (the synthetic corpus has no newlines).

    Scale: shingle generation is pure map-side (split + posexplode +
    slice, all JVM built-ins); one shuffle groups by ngram. At 100 TB the
    carried key should be xxhash64(ngram) not the string (8 bytes vs ~30),
    with the string re-derived only for the surviving ~0.01%; the distinct
    doc-count is Catalyst's standard two-level expansion. Frequency is
    power-law — AQE skew splitting handles the mega-common shingles."""
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    exploded = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= _N)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("ws") - _N)).alias("i"),
            "ws",
        )
        .select(
            "doc_id",
            F.array_join(F.slice(F.col("ws"), F.col("i") + 1, _N), " ").alias("ngram"),
        )
    )
    return (
        exploded.groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 3)
    )


# ---------------------------------------------------------------------------
# ta07 — heuristic quality filtering
# ---------------------------------------------------------------------------


@query(
    "ta07_quality_filters",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        pc AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY doc_id, word),
        d AS (SELECT doc_id,
                     CAST(SUM(cnt) AS BIGINT) AS n_words,
                     COUNT(*) AS n_distinct,
                     MAX(cnt) AS max_word_cnt,
                     CAST(COALESCE(SUM(cnt) FILTER (word IN ('the', 'a')), 0)
                          AS BIGINT) AS stop_cnt
              FROM pc GROUP BY doc_id)
       SELECT doc_id, n_words, n_distinct, max_word_cnt, stop_cnt,
              (n_words >= 30
               AND max_word_cnt * 8 <= n_words
               AND stop_cnt * 5 < n_words
               AND n_distinct * 3 >= n_words) AS keep
       FROM d""",
)
def ta07_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality gate: per-document word count,
    vocabulary size, top-word repetition, and stopword mass, combined into
    a keep flag — short docs, repetition-heavy docs (one word > 1/8 of
    tokens), stopword-stuffed docs (> 1/5), and low-diversity docs
    (distinct < 1/3 of tokens) are dropped. Every ratio test is
    cross-multiplied over exact integer counts, so the keep set is
    engine-independent.

    Scale: one shuffle to the (doc_id, word) histogram — dominated by
    map-side combine since within-doc repeats collapse locally — and the
    per-doc reduction rides the same doc_id-prefixed partitioning (no
    second exchange under AQE). The stopword membership is a tiny literal
    IN list evaluated in codegen; real deployments broadcast a lexicon."""
    docs = load(spark, sf_dir, "documents")
    per_word = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    stats = per_word.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("max_word_cnt"),
        F.coalesce(
            F.sum(F.when(F.col("word").isin("the", "a"), F.col("cnt"))), F.lit(0)
        ).alias("stop_cnt"),
    )
    keep = (
        (F.col("n_words") >= 30)
        & (F.col("max_word_cnt") * 8 <= F.col("n_words"))
        & (F.col("stop_cnt") * 5 < F.col("n_words"))
        & (F.col("n_distinct") * 3 >= F.col("n_words"))
    )
    return stats.select(
        "doc_id", "n_words", "n_distinct", "max_word_cnt", "stop_cnt", keep.alias("keep")
    )


# ---------------------------------------------------------------------------
# ta08 — character-window chunking with overlap
# ---------------------------------------------------------------------------

_CHUNK = 120
_STRIDE = 100


@query(
    "ta08_char_chunks",
    f"""SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               md5(substring(text, CAST(i * {_STRIDE} + 1 AS INTEGER), {_CHUNK})) AS chunk_md5,
               CAST(length(substring(text, CAST(i * {_STRIDE} + 1 AS INTEGER), {_CHUNK})) AS BIGINT)
                 AS chunk_len
        FROM documents, UNNEST(range(0, (length(text) - 1) // {_STRIDE} + 1)) AS t(i)""",
)
def ta08_char_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length shaping: split every document into {_CHUNK}-char
    windows advancing by {_STRIDE} chars ({_CHUNK - _STRIDE} chars of
    overlap so no boundary content is lost) — the character-granularity
    form of token-window chunking for a fixed training context. Chunk
    content is surfaced as md5 + length; a real pipeline would carry the
    substring itself into the shard writer.

    Scale: pure map-side — sequence + posexplode + substring are all
    codegen'd built-ins, no shuffle, no Python; output rows ≈ input chars
    / {_STRIDE}. Downstream shard assembly (group chunks to ~equal-token
    files) adds exactly one repartitionByRange on a hash key."""
    docs = load(spark, sf_dir, "documents")

    # Chunk count derives from the TEXT, not the denormalized n_chars
    # column (metadata can lie — the maxvals layout's n_chars = 2^62
    # drove sequence() past the array limit, r10), and chunks slice a
    # BOUND char array (functions/text.py bind + char_array): substring
    # with a column position scans to the code point, O(L²/stride) per
    # doc on a 1 MB text; the array form is O(L·chunk/stride) with
    # identical chunk strings.
    def chunks(ch):
        return F.transform(
            F.sequence(
                F.lit(0),
                F.floor(F.greatest(F.size(ch) - 1, F.lit(0)) / _STRIDE).cast("int"),
            ),
            lambda i: F.concat_ws("", F.slice(ch, i * _STRIDE + 1, _CHUNK)),
        )

    return (
        docs.select(
            "doc_id",
            F.posexplode(bind(char_array("text"), chunks)).alias("idx", "w"),
        )
        .select(
            "doc_id",
            F.col("idx").cast("bigint").alias("chunk_idx"),
            F.md5("w").alias("chunk_md5"),
            F.length("w").cast("bigint").alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# sm03 — deterministic train/val/test split assignment
# ---------------------------------------------------------------------------


@query(
    "sm03_split_assignment",
    """WITH assigned AS (
         SELECT doc_id, n_chars,
                CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
                     THEN 'train'
                     WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 8
                     THEN 'val'
                     ELSE 'test' END AS split
         FROM documents)
       SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM assigned GROUP BY split""",
)
def sm03_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from a content
    hash (md5(doc_id) mod 10), summarized per split. Hash-based splits —
    unlike rand() — are stable across engines, re-runs, and incremental
    corpus growth: a document never migrates between splits when new data
    arrives, which is what keeps held-out sets honest.

    Scale: the assignment is a stateless map evaluated in codegen; the
    summary is a 3-key aggregate (map-side combine collapses everything
    before the single tiny exchange). In the real pipeline the split
    column becomes a parquet partition key so training jobs read only
    their shard via partition pruning."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


# ---------------------------------------------------------------------------
# pp01 — the end-to-end corpus pipeline, composed
# ---------------------------------------------------------------------------

_PP_MIN_CHARS = 100  # quality gate
_PP_BENCH_MOD = 29  # doc_id % 29 == 0 plays the held-out eval set (as dd10)
_PP_NGRAM = 5  # decontamination shingle width (as dd10)
_PP_SOURCE_CAP = 10  # per-source contribution cap (as sm05)


@query(
    "pp01_corpus_pipeline",
    f"""WITH q AS (
          SELECT doc_id, text, source, n_chars FROM documents
          WHERE n_chars >= {_PP_MIN_CHARS} AND doc_id % {_PP_BENCH_MOD} <> 0),
        dedup AS (
          SELECT doc_id, text, source, n_chars FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
            FROM q) WHERE doc_id = keep_id),
        w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id,
                     array_to_string(list_slice(ws, i + 1, i + {_PP_NGRAM}), ' ') AS ngram
              FROM w, UNNEST(range(0, len(ws) - {_PP_NGRAM} + 1)) AS t(i)
              WHERE len(ws) >= {_PP_NGRAM}),
        bench AS (SELECT DISTINCT ngram FROM g WHERE doc_id % {_PP_BENCH_MOD} = 0),
        contaminated AS (
          SELECT DISTINCT doc_id FROM g
          WHERE doc_id % {_PP_BENCH_MOD} <> 0
            AND ngram IN (SELECT ngram FROM bench)),
        clean AS (
          SELECT d.* FROM dedup d
          WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
        capped AS (
          SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM clean),
        final AS (
          SELECT source, n_chars,
                 CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
                      THEN 'train'
                      WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 8
                      THEN 'val'
                      ELSE 'test' END AS split
          FROM capped WHERE rn <= {_PP_SOURCE_CAP})
        SELECT source, split, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM final GROUP BY source, split""",
)
def pp01_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE composed dataflow — the
    query a corpus team actually ships, assembled from the catalog's
    building blocks in their production order:

      1. quality gate   (n_chars >= 100; ta07's cheapest predicate)
      2. exact dedup    (md5(text) → keep min doc_id; dd01's shape)
      3. decontaminate  (drop docs sharing a word 5-gram with the
                         held-out doc_id%29==0 split; dd10's shape)
      4. per-source cap (top-10 per source in md5(doc_id) order; sm05)
      5. split + report (md5 mod 10 → 80/10/10; sm03) rolled up per
                         (source, split)

    Composing them in one DataFrame lets Catalyst treat the pipeline as a
    single plan: the quality predicate pushes into the one parquet scan
    that feeds stages 2-5, and the doc bodies never survive past the
    md5 projections.

    Scale: stage order is deliberate — the cheap stateless gate runs
    first so every shuffle downstream sees fewer rows; dedup is one
    hash-key shuffle; decontamination is two broadcast probes (bench
    grams, then contaminated ids — both benchmark-sized); the cap is one
    shuffle on source with a WindowGroupLimit rank; the final rollup is
    map-side combinable to |sources|×3 rows. Two shuffles over the
    corpus total, everything else broadcast or map-side."""
    from pyspark.sql import Window

    from .corpus2 import _word_ngrams

    docs = load(spark, sf_dir, "documents")
    q = docs.filter(
        (F.col("n_chars") >= _PP_MIN_CHARS)
        & (F.col("doc_id") % _PP_BENCH_MOD != 0)
    ).select("doc_id", "text", "source", "n_chars")
    # one-shuffle exact dedup: min-id per content hash as a window, no
    # join back against a second corpus-sized aggregate
    hw = Window.partitionBy(F.md5("text"))
    dedup = (
        q.withColumn("keep_id", F.min("doc_id").over(hw))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text", "source", "n_chars")
    )
    grams = _word_ngrams(docs, _PP_NGRAM)
    bench = (
        grams.filter(F.col("doc_id") % _PP_BENCH_MOD == 0).select("ngram").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % _PP_BENCH_MOD != 0)
        .join(F.broadcast(bench), "ngram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = dedup.join(F.broadcast(contaminated), "doc_id", "left_anti")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    capped = clean.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _PP_SOURCE_CAP
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 10
    )
    split = F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    return (
        capped.select("source", split.alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )
