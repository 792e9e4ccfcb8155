"""Training-corpus curation operators, third batch: n-gram-level
decontamination scoring, deterministic per-source caps, Gopher-style
bigram repetition gating, and the dedup shrinkage report a pipeline run
publishes. All hashing is md5-derived and all ratio tests are either
cross-multiplied integers or a single IEEE double division, so DuckDB
reproduces every value bit-exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from .queries import query

# ---------------------------------------------------------------------------
# dd13 — n-gram overlap decontamination scoring
# ---------------------------------------------------------------------------

_N = 4  # gram width shared with dd09
_EVAL_MOD = 20  # doc_id % 20 == 0 → the held-out "benchmark" slice


def _grams(docs: DataFrame) -> DataFrame:
    """Distinct word 4-grams per document (dd09's generator + DISTINCT)."""
    ws = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= _N)
        .select("doc_id", F.explode(F.sequence(F.lit(0), F.size("ws") - _N)).alias("i"), "ws")
        .select("doc_id", F.array_join(F.slice(F.col("ws"), F.col("i") + 1, _N), " ").alias("gram"))
        .distinct()
    )


@query(
    "dd13_contamination_overlap",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT DISTINCT doc_id,
                     array_to_string(list_slice(ws, i + 1, i + {_N}), ' ') AS gram
              FROM w, UNNEST(range(0, len(ws) - {_N} + 1)) AS t(i)
              WHERE len(ws) >= {_N}),
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_EVAL_MOD} = 0),
        tr AS (SELECT doc_id, gram FROM g WHERE doc_id % {_EVAL_MOD} <> 0)
        SELECT tr.doc_id,
               COUNT(*) AS n_grams,
               COUNT(ev.gram) AS n_hit,
               CAST(COUNT(ev.gram) AS DOUBLE) / COUNT(*) AS overlap_frac,
               (COUNT(ev.gram) * 2 >= COUNT(*)) AS contaminated
        FROM tr LEFT JOIN ev ON tr.gram = ev.gram
        GROUP BY tr.doc_id""",
)
def dd13_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination at n-gram granularity: score every
    training document by the fraction of its distinct 4-grams that also
    occur in the held-out eval slice (here doc_id % 20 == 0 stands in for
    the benchmark corpus), and flag docs with ≥50% overlap. This is the
    finer-grained sibling of dd10's whole-document hash anti-join — the
    pass that catches PARTIAL test-set leakage (a benchmark question
    quoted inside a larger page), per the n-gram overlap procedure of
    GPT-3/PaLM-style decontamination.

    Scale: the eval-gram dictionary is benchmark-sized (thousands of
    docs), orders of magnitude smaller than the corpus — so it carries an
    explicit broadcast hint and the scoring join is map-side against
    every training gram; the only shuffle is the per-doc groupBy. The
    contaminated flag cross-multiplies integers; the reported fraction is
    one IEEE division — both engine-exact."""
    g = _grams(load(spark, sf_dir, "documents"))
    ev = (
        g.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tr = g.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), on="gram", how="left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.count("hit").alias("n_hit"))
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_grams")).alias("overlap_frac"),
            (F.col("n_hit") * 2 >= F.col("n_grams")).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# sm05 — deterministic per-source document cap
# ---------------------------------------------------------------------------

_CAP_PER_SOURCE = 10


@query(
    "sm05_per_source_cap",
    f"""WITH r AS (SELECT source, doc_id,
                          ROW_NUMBER() OVER (
                            PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                   FROM documents)
        SELECT source, doc_id, rn FROM r WHERE rn <= {_CAP_PER_SOURCE}""",
)
def sm05_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: keep at most K documents per source,
    chosen by content-hash order (md5 of the id, doc_id tiebreak) — the
    guard that stops one crawled domain from dominating a training
    mixture. Hash order makes the kept set a uniform, run-reproducible
    sample of the source, unlike "first K by ingest order" (which biases
    toward old pages) or rand() (which none of this repo's samplers use).

    Scale: one shuffle on source + a K-bounded rank — Spark plans
    rank-filter windows as a per-partition running top-K (WindowGroupLimit
    pushes the predicate below the sort), so a mega-source never
    materializes beyond K rows per task after the sort spill. A skewed
    source is one hot partition: at 100 TB pre-aggregate with a salted
    two-level top-K (w01's pattern) or let AQE split the straggler."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CAP_PER_SOURCE)
    )


# ---------------------------------------------------------------------------
# ta11 — Gopher top-bigram repetition gate
# ---------------------------------------------------------------------------


@query(
    "ta11_top_bigram_fraction",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       b AS (SELECT doc_id,
                    array_to_string(list_slice(ws, i + 1, i + 2), ' ') AS bigram
             FROM w, UNNEST(range(0, len(ws) - 1)) AS t(i)
             WHERE len(ws) >= 2),
       c AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM b GROUP BY doc_id, bigram),
       d AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                    CAST(MAX(cnt) AS BIGINT) AS top_cnt
             FROM c GROUP BY doc_id)
       SELECT doc_id, n_bigrams, top_cnt,
              CAST(top_cnt AS DOUBLE) / n_bigrams AS top_frac,
              (top_cnt * 5 <= n_bigrams) AS keep
       FROM d""",
)
def ta11_top_bigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rule at bigram granularity: the fraction of a
    document occupied by its single most frequent word 2-gram, with the
    keep gate top_frac ≤ 20% (cross-multiplied as top_cnt*5 ≤ n_bigrams).
    Complements ta07, which gates on single-word repetition — the bigram
    form catches templated boilerplate ("click here click here …") that
    single-word stats miss.

    Scale: bigram generation is map-side (split + posexplode + slice);
    the (doc_id, bigram) histogram partial-aggregates before its one
    shuffle, and the per-doc max/sum reduction rides the doc_id-prefixed
    partitioning without a second exchange under AQE."""
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    bigrams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(F.sequence(F.lit(0), F.size("ws") - 2)).alias("i"), "ws")
        .select("doc_id", F.array_join(F.slice(F.col("ws"), F.col("i") + 1, 2), " ").alias("bigram"))
    )
    hist = bigrams.groupBy("doc_id", "bigram").agg(F.count("*").alias("cnt"))
    return (
        hist.groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_bigrams"), F.max("cnt").alias("top_cnt"))
        .select(
            "doc_id",
            "n_bigrams",
            "top_cnt",
            (F.col("top_cnt").cast("double") / F.col("n_bigrams")).alias("top_frac"),
            (F.col("top_cnt") * 5 <= F.col("n_bigrams")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# dd14 — dedup shrinkage report
# ---------------------------------------------------------------------------


@query(
    "dd14_dedup_report",
    """SELECT source,
              COUNT(*) AS n_docs,
              COUNT(DISTINCT md5(text)) AS n_unique,
              CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_removed,
              CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*)
                AS shrink_frac
       FROM documents GROUP BY source""",
)
def dd14_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report a dedup pass publishes: per source, how many documents
    arrived, how many distinct bodies remain after exact (hash) dedup,
    and the removal fraction — the observability artifact that catches a
    crawler re-ingesting a domain or a mirror site flooding one source.

    Scale: COUNT(DISTINCT md5(text)) hashes each body to 16 bytes
    map-side, then runs Catalyst's standard two-phase distinct expansion
    keyed (source, hash) — the same single-shuffle shape as dd01, with
    the counter rollup free on top. No document body ever shuffles."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_removed"),
            ((F.col("n_docs") - F.col("n_unique")).cast("double") / F.col("n_docs")).alias(
                "shrink_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# ta12 — OOV rate against the corpus top-K vocabulary
# ---------------------------------------------------------------------------

_VOCAB_K = 50


@query(
    "ta12_oov_rate",
    f"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents),
        cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        vocab AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT {_VOCAB_K}),
        j AS (SELECT t.doc_id, (v.w IS NOT NULL) AS iv
              FROM tok t LEFT JOIN vocab v ON t.w = v.w)
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(COALESCE(COUNT(*) FILTER (NOT iv), 0) AS BIGINT) AS n_oov,
               CAST(COALESCE(COUNT(*) FILTER (NOT iv), 0) AS DOUBLE) / COUNT(*)
                 AS oov_frac
        FROM j GROUP BY doc_id""",
)
def ta12_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model data quality proxy without floats: per document, the
    fraction of tokens OUTSIDE the corpus's top-K vocabulary (count-desc,
    word-asc tiebreak → fully deterministic). High OOV rate marks
    gibberish, boilerplate markup, or wrong-language text — the
    integer-exact stand-in for a perplexity filter (whose log-float
    scores cross-engine hashing can't pin).

    Scale: pass 1 builds the vocabulary with one combine-friendly word
    histogram + a K-bounded TakeOrdered (never a full sort); pass 2
    broadcasts the K-row vocabulary and scores map-side, with the per-doc
    rollup as the only shuffle. At 100 TB both passes stream the corpus
    once each; a 100k-entry vocabulary is still trivially broadcastable."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(_VOCAB_K)
        .select("w")
        .withColumn("iv", F.lit(1))
    )
    return (
        tok.join(F.broadcast(vocab), on="w", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.coalesce(F.count(F.when(F.col("iv").isNull(), 1)), F.lit(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_frac"),
        )
    )


# ---------------------------------------------------------------------------
# fe02 — per-label embedding centroids (long form)
# ---------------------------------------------------------------------------


@query(
    "fe02_label_centroids",
    """WITH q AS (SELECT label,
                         list_transform(embedding,
                                        x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000)
                                                  AS BIGINT)) AS qv
                  FROM embeddings),
       e AS (SELECT label, i - 1 AS dim, qv[i] AS qval
             FROM q, UNNEST(range(1, 65)) AS t(i))
       SELECT label, dim, CAST(SUM(qval) AS BIGINT) AS sum_q, COUNT(*) AS n,
              CAST(SUM(qval) AS DOUBLE) / COUNT(*) AS centroid
       FROM e GROUP BY label, dim""",
)
def fe02_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class prototypes: the mean embedding per label, emitted in long
    (label, dim) form with the exact integer component sums — the
    primitive behind SemDeDup cells, IVF codebook seeding, and
    label-centroid classifiers. Components are 1000x-quantized to int64
    (operators/similarity.py:29) so the sums are engine-exact; the mean
    is one IEEE division.

    Scale: posexplode fans each row into 64 (label, dim, qval) triples
    map-side, then ONE combine-friendly shuffle on the (label, dim) key —
    64x row inflation but constant bytes per triple, and the partial
    aggregation collapses it to |labels|x64 groups before the exchange.
    The long output form keeps every value driver-hashable (no nested
    arrays) and feeds the next k-means/IVF step by pivot or collect_list."""
    from ..operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(S.quantize("embedding")).alias("dim", "qval"))
        .groupBy("label", F.col("dim").cast("long").alias("dim"))
        .agg(F.sum("qval").alias("sum_q"), F.count("*").alias("n"))
        .select(
            "label",
            "dim",
            "sum_q",
            "n",
            (F.col("sum_q").cast("double") / F.col("n")).alias("centroid"),
        )
    )


# ---------------------------------------------------------------------------
# ta13 — sequence-packing efficiency report
# ---------------------------------------------------------------------------

_CTX_LEN = 128


@query(
    "ta13_packing_plan",
    f"""WITH t AS (SELECT doc_id, source,
                          len(string_split(text, ' ')) AS n_tok
                   FROM documents)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(SUM((n_tok + {_CTX_LEN - 1}) // {_CTX_LEN}) AS BIGINT)
                 AS n_chunks,
               CAST(SUM((n_tok + {_CTX_LEN - 1}) // {_CTX_LEN}) * {_CTX_LEN}
                    - SUM(n_tok) AS BIGINT) AS pad_waste,
               CAST(SUM((n_tok + {_CTX_LEN - 1}) // {_CTX_LEN}) * {_CTX_LEN}
                    - SUM(n_tok) AS DOUBLE)
                 / (SUM((n_tok + {_CTX_LEN - 1}) // {_CTX_LEN}) * {_CTX_LEN})
                 AS waste_frac
        FROM t GROUP BY source""",
)
def ta13_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing efficiency: per source, how many context-length
    chunks the corpus fills if every document is padded to a multiple of
    the context length (128 tokens here), and the padding waste — the
    report that decides whether a pipeline needs cross-document packing
    (high waste_frac ⇒ many short docs ⇒ pack or concatenate).

    Scale: per-row token count is map-side (split + size, no explode —
    the corpus never inflates), then one combine-friendly groupBy source.
    Everything before the one reported fraction is integer-exact."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    chunks = F.floor((n_tok + (_CTX_LEN - 1)) / _CTX_LEN).cast("long")
    per_doc = docs.select("source", n_tok.alias("n_tok"), chunks.alias("n_chunks"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_chunks").alias("n_chunks"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "n_chunks",
            (F.col("n_chunks") * _CTX_LEN - F.col("total_tokens")).alias("pad_waste"),
            (
                (F.col("n_chunks") * _CTX_LEN - F.col("total_tokens")).cast("double")
                / (F.col("n_chunks") * _CTX_LEN)
            ).alias("waste_frac"),
        )
    )


# ---------------------------------------------------------------------------
# dd15 — cross-source duplication matrix
# ---------------------------------------------------------------------------


def _dd15_oracle() -> str:
    # Reuse the canonical minhash CTE + capped pair generation
    # (plans/dedup.py) so this oracle and the Spark side share ONE hash
    # family AND one bucket-cap policy — an independently-written family
    # can agree on exact dups yet diverge on borderline near-dups.
    from .dedup import capped_pairs_subquery

    return f"""WITH pairs AS (
          SELECT doc_a, doc_b FROM {capped_pairs_subquery()} t)
        SELECT least(da.source, db.source) AS source_x,
               greatest(da.source, db.source) AS source_y,
               COUNT(*) AS n_pairs
        FROM pairs
        JOIN documents da ON pairs.doc_a = da.doc_id
        JOIN documents db ON pairs.doc_b = db.doc_id
        GROUP BY 1, 2"""


@query("dd15_cross_source_dup_matrix", _dd15_oracle())
def dd15_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who copies from whom: the LSH near-dup candidate pairs (dd03's
    exact pipeline) rolled up into an unordered source×source matrix —
    the provenance report that exposes mirror sites and syndication
    between crawl sources (large off-diagonal cells) versus internal
    duplication (diagonal cells).

    Scale: reuses the bucketed pair generation (never all-pairs); the two
    doc→source lookups join against a projection carrying only
    (doc_id, source) — at 100 TB that side is a compact dimension and
    both lookups broadcast; one final combine-friendly groupBy on the
    normalized (least, greatest) source pair."""
    from ..operators import dedup as D

    docs = load(spark, sf_dir, "documents")
    pairs = D.lsh_candidate_pairs(
        D.lsh_band_keys(D.minhash_signatures(docs, num_hashes=16), rows_per_band=4),
        max_bucket_width=D.DEFAULT_MAX_BUCKET_WIDTH,
    )
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    b = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(F.broadcast(a), on="doc_a")
        .join(F.broadcast(b), on="doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .groupBy("source_x", "source_y")
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# dd16 — MinHash Jaccard estimate per candidate pair
# ---------------------------------------------------------------------------


def _dd16_oracle() -> str:
    from .dedup import _SIG_CTE, capped_pairs_subquery

    return f"""WITH {_SIG_CTE},
        pairs AS (
          SELECT doc_a, doc_b FROM {capped_pairs_subquery()} t)
        SELECT p.doc_a, p.doc_b,
               CAST(COALESCE(COUNT(*) FILTER (sa.minhash = sb.minhash), 0) AS BIGINT)
                 AS n_equal,
               CAST(COALESCE(COUNT(*) FILTER (sa.minhash = sb.minhash), 0) AS DOUBLE)
                 / 16 AS jaccard_est
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
        GROUP BY p.doc_a, p.doc_b"""


@query("dd16_minhash_jaccard_estimate", _dd16_oracle())
def dd16_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimator inside MinHash-LSH, surfaced: for every candidate
    pair, the fraction of the 16 signature components that agree — an
    unbiased estimate of Jaccard similarity (P[minhash collision] =
    Jaccard). This is the cheap triage between candidate generation
    (dd03) and exact verification (dd04/dd11): thresholding on the
    estimate costs 16 int comparisons per pair instead of re-shingling
    both documents.

    Scale: signatures are 16 rows × 16 bytes per doc — the signature
    table is ~1000× smaller than the corpus; both pair-side joins are on
    (doc_id, seed) equi-keys and the rollup is a combine-friendly groupBy
    on the pair. Everything downstream of signature computation never
    touches document text."""
    from ..operators import dedup as D

    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, num_hashes=16)
    pairs = D.lsh_candidate_pairs(
        D.lsh_band_keys(sigs, rows_per_band=4),
        max_bucket_width=D.DEFAULT_MAX_BUCKET_WIDTH,
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), "seed", F.col("minhash").alias("mh_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), "seed", F.col("minhash").alias("mh_b")
    )
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on=["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.coalesce(
                F.count(F.when(F.col("mh_a") == F.col("mh_b"), 1)), F.lit(0)
            ).alias("n_equal")
        )
        .select(
            "doc_a",
            "doc_b",
            "n_equal",
            (F.col("n_equal").cast("double") / 16).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# ta14 — within-document duplicate n-gram mass (Gopher rep-ngram rule)
# ---------------------------------------------------------------------------

_DUP_N = 4


@query(
    "ta14_dup_ngram_mass",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id,
                     array_to_string(list_slice(ws, i + 1, i + {_DUP_N}), ' ') AS ngram
              FROM w, UNNEST(range(0, len(ws) - {_DUP_N} + 1)) AS t(i)
              WHERE len(ws) >= {_DUP_N}),
        c AS (SELECT doc_id, ngram, COUNT(*) AS cnt FROM g GROUP BY doc_id, ngram),
        d AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
                     CAST(COALESCE(SUM(cnt) FILTER (cnt >= 2), 0) AS BIGINT) AS dup_mass
              FROM c GROUP BY doc_id)
        SELECT doc_id, n_grams, dup_mass,
               CAST(dup_mass AS DOUBLE) / n_grams AS dup_frac,
               (dup_mass * 5 <= n_grams) AS keep
        FROM d""",
)
def ta14_dup_ngram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's within-document repetition rule at n-gram-occurrence
    granularity: the fraction of a document's word 4-gram occurrences
    that belong to a REPEATED 4-gram (cnt ≥ 2), gated at 20%
    (cross-multiplied: dup_mass*5 ≤ n_grams).  ta11 catches one dominant
    bigram; this catches diffuse self-repetition — a page that loops its
    own paragraphs trips dup_mass long before any single n-gram wins
    ta11's top slot.  Complements dd09, which finds n-grams repeated
    ACROSS documents.

    Scale: 4-gram generation is map-side; the (doc_id, ngram) histogram
    partial-aggregates before its single shuffle, and the per-doc rollup
    rides the same doc_id-prefixed partitioning. At 100 TB carry
    xxhash64(ngram) instead of the string through the histogram."""
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    grams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= _DUP_N)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("ws") - _DUP_N)).alias("i"),
            "ws",
        )
        .select(
            "doc_id",
            F.array_join(F.slice(F.col("ws"), F.col("i") + 1, _DUP_N), " ").alias("ngram"),
        )
    )
    hist = grams.groupBy("doc_id", "ngram").agg(F.count("*").alias("cnt"))
    return (
        hist.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))), F.lit(0)
            ).alias("dup_mass"),
        )
        .select(
            "doc_id",
            "n_grams",
            "dup_mass",
            (F.col("dup_mass").cast("double") / F.col("n_grams")).alias("dup_frac"),
            (F.col("dup_mass") * 5 <= F.col("n_grams")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# ta15 — per-source median-length gate (rank-based, no interpolation)
# ---------------------------------------------------------------------------


@query(
    "ta15_per_source_median_gate",
    """WITH r AS (
         SELECT source, doc_id, n_chars,
                ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY n_chars, doc_id) AS rk,
                COUNT(*) OVER (PARTITION BY source) AS n_source
         FROM documents)
       SELECT source, doc_id, n_chars, rk, n_source,
              (2 * rk > n_source) AS keep
       FROM r""",
)
def ta15_per_source_median_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality thresholding: keep each document only if it sits
    in the UPPER half of its own source's length distribution — the
    per-domain adaptive gate that absolute thresholds (ta07) can't
    express (a length fine for forum posts is suspicious for e-books).
    The median is decided by integer rank (2·rank > count), never an
    interpolated percentile — interpolation doubles differ between
    engines; ranks cannot.

    Scale: one shuffle on source; both window functions share the single
    sort (row_number and the partition count ride the same frame). A
    skewed mega-source is one hot partition — the same salted two-level
    treatment as sm05 applies if a source ever dominates."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_source", F.count("*").over(wc))
        .select(
            "source",
            "doc_id",
            "n_chars",
            "rk",
            "n_source",
            (2 * F.col("rk") > F.col("n_source")).alias("keep"),
        )
    )
