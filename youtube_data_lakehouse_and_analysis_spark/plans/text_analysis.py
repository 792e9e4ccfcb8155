"""Text-analysis queries (ta-series) over `documents`: token statistics,
quality scoring, language-ID heuristic, document fingerprinting — the text
half of an LLM-data curation pipeline, all as built-in column expressions
with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import bind, char_array, normalize_text, tokens
from .queries import query

# trim's second arg pins ASCII-space-only trimming: DuckDB's 1-arg trim
# strips Unicode spaces (e.g. U+3000) while Spark's trim is ASCII-only,
# and the engine's normalize_text (functions/text.py) is the contract
# (see TESTDATA.md "Unicode contract").
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')"
_TOKS = f"list_filter(string_split({_NORM}, ' '), x -> x <> '')"

# tiny stopword profiles for the language-ID heuristic (n-gram/stopword
# scoring — a deterministic, SQL-expressible proxy for real lang-ID)
_PROFILES = {
    "en": ["the", "a", "of", "to", "and", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
}


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "ta01_token_stats",
    f"""SELECT doc_id,
               len({_TOKS}) AS n_tokens,
               length(text) AS n_chars_raw,
               n_chars,
               CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
                 / greatest(len({_TOKS}), 1) AS avg_token_len,
               len(regexp_extract_all({_NORM}, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_pieces
        FROM documents""",
)
def ta01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish pre-tokenizer regex
    (letter runs / digit runs / single symbols), plus mean token length."""
    d = load(spark, sf_dir, "documents")
    t = tokens("text")
    return d.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.length("text").alias("n_chars_raw"),
        "n_chars",
        (
            F.aggregate(F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x).cast("double")
            / F.greatest(F.size(t), F.lit(1))
        ).alias("avg_token_len"),
        F.size(F.regexp_extract_all(normalize_text("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "n_bpe_pieces"
        ),
    )


@query(
    "ta02_quality_score",
    f"""WITH stats AS (
          SELECT doc_id,
                 len({_TOKS}) AS n_tokens,
                 len(list_filter({_TOKS},
                     x -> list_contains({_sql_list(_PROFILES["en"])}, x))) AS n_stop,
                 len(regexp_extract_all({_NORM}, '[^a-z0-9 ]')) AS n_symbols,
                 length({_NORM}) AS n_chars_norm
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
               CAST(n_symbols AS DOUBLE) / greatest(n_chars_norm, 1) AS symbol_ratio,
               0.5 * (CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1))
             + 0.3 * (1.0 - CAST(n_symbols AS DOUBLE) / greatest(n_chars_norm, 1))
             + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS quality_score
        FROM stats""",
)
def ta02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: stopword density + symbol-noise penalty +
    length prior — the standard cheap pre-filter before expensive model
    scoring in a curation pipeline."""
    d = load(spark, sf_dir, "documents")
    t = tokens("text")
    n_tokens = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*_PROFILES["en"])))
    n_symbols = F.size(F.regexp_extract_all(normalize_text("text"), F.lit("[^a-z0-9 ]"), 0))
    n_chars_norm = F.length(normalize_text("text"))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    sym_ratio = n_symbols.cast("double") / F.greatest(n_chars_norm, F.lit(1))
    len_prior = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        sym_ratio.alias("symbol_ratio"),
        (0.5 * stop_ratio + 0.3 * (1.0 - sym_ratio) + 0.2 * len_prior).alias("quality_score"),
    )


@query(
    "ta03_langid",
    f"""WITH scores AS (
          SELECT doc_id, lang AS lang_declared,
                 CAST(len(list_filter({_TOKS}, x -> list_contains({_sql_list(_PROFILES["en"])}, x))) AS DOUBLE)
                   / greatest(len({_TOKS}), 1) AS en_score,
                 CAST(len(list_filter({_TOKS}, x -> list_contains({_sql_list(_PROFILES["es"])}, x))) AS DOUBLE)
                   / greatest(len({_TOKS}), 1) AS es_score,
                 CAST(len(list_filter({_TOKS}, x -> list_contains({_sql_list(_PROFILES["de"])}, x))) AS DOUBLE)
                   / greatest(len({_TOKS}), 1) AS de_score
          FROM documents)
        SELECT doc_id, lang_declared, en_score, es_score, de_score,
               CASE WHEN en_score >= es_score AND en_score >= de_score THEN 'en'
                    WHEN es_score >= de_score THEN 'es'
                    ELSE 'de' END AS lang_pred
        FROM scores""",
)
def ta03_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (deterministic heuristic; argmax with
    fixed en>es>de tie order). At scale the same shape works with char
    n-gram profiles instead of stopword lists."""
    d = load(spark, sf_dir, "documents")
    t = tokens("text")
    n = F.greatest(F.size(t), F.lit(1))

    def score(lang: str):
        return F.size(F.filter(t, lambda x: x.isin(*_PROFILES[lang]))).cast("double") / n

    en, es, de = score("en"), score("es"), score("de")
    pred = (
        F.when((en >= es) & (en >= de), "en").when(es >= de, "es").otherwise("de")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        en.alias("en_score"),
        es.alias("es_score"),
        de.alias("de_score"),
        pred.alias("lang_pred"),
    )


@query(
    "ta04_fingerprint",
    f"""SELECT doc_id,
               md5(n) AS fp_md5,
               (SELECT min(md5(substr(n, i, 8)))
                FROM unnest(range(1, greatest(length(n) - 6, 2))) AS t(i)) AS fp_rolling_min
        FROM (SELECT doc_id, {_NORM} AS n FROM documents) s""",
)
def ta04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: whole-text md5 + winnowing-style minimum over
    rolling 8-char gram hashes (robust to local edits).

    The rolling grams slice a BOUND char array (functions/text.py
    char_array + bind) rather than calling substr(n, i, 8) per position:
    substr scans to code point i, so the rolling form is O(L²) in text
    length (hours on the maxvals layout's 1 MB doc, r10), and a
    withColumn alias is no fix — project collapse inlines it back into
    the lambda; the bound array form is O(L·8) with identical windows."""
    d = load(spark, sf_dir, "documents")
    d2 = d.withColumn("n", normalize_text("text"))

    def rolling_min(nch):
        return F.array_min(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(nch) - 6 - 1, F.lit(1))),
                lambda i: F.md5(F.concat_ws("", F.slice(nch, i, F.lit(8)))),
            )
        )

    return d2.select(
        "doc_id",
        F.md5("n").alias("fp_md5"),
        bind(char_array("n"), rolling_min).alias("fp_rolling_min"),
    )


@query(
    "ta06_vocabulary",
    r"""WITH norm AS (
          SELECT doc_id,
                 list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '), ' '),
                             x -> x <> '') AS toks
          FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM norm)
        SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS doc_freq
        FROM tok GROUP BY token
        ORDER BY n_occurrences DESC, token LIMIT 1000""",
)
def ta06_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-1000 tokens by occurrence count with document
    frequency — the corpus statistic behind tokenizer training, stopword
    induction, and TF-IDF weighting. Order is total (count desc, token asc)
    so both engines pick the identical cutoff.

    Scale: explode → groupBy(token) is one shuffle whose payload is the
    token stream; partial aggregation collapses each mapper's repeats
    before the exchange, and the (count, doc_freq) pair per token is a
    fixed-size state. distinct-doc counting shuffles (token, doc_id) —
    exact here; at 100 TB swap in approx_count_distinct for a fixed-size
    HLL sketch per token. Top-1000 is TakeOrderedAndProject."""
    from ..functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(1000)
    )


# ---------------------------------------------------------------------------
# ta16 — character-distribution concentration per source (gibberish gate)
# ---------------------------------------------------------------------------

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _ta16_sql() -> str:
    cnts = ",\n                ".join(
        f"CAST(SUM(length(t) - length(replace(t, '{ch}', ''))) AS BIGINT) AS c_{ch}"
        for ch in _LETTERS
    )
    total = " + ".join(f"c_{ch}" for ch in _LETTERS)
    nz = " + ".join(f"(CASE WHEN c_{ch} > 0 THEN 1 ELSE 0 END)" for ch in _LETTERS)
    maxc = "greatest(" + ", ".join(f"c_{ch}" for ch in _LETTERS) + ")"
    sumsq = " + ".join(f"c_{ch} * c_{ch}" for ch in _LETTERS)
    return f"""WITH t AS (
          SELECT source, regexp_replace(lower(text), '[^a-z]', '', 'g') AS t
          FROM documents),
        agg AS (
          SELECT source, COUNT(*) AS n_docs,
                {cnts}
          FROM t GROUP BY source),
        tot AS (
          SELECT source, n_docs,
                 ({total}) AS total_letters,
                 ({nz}) AS distinct_letters,
                 {maxc} AS max_letter_count,
                 ({sumsq}) AS sum_sq
          FROM agg)
        SELECT source, n_docs, total_letters, distinct_letters, max_letter_count,
               CASE WHEN total_letters = 0 THEN 0.0
                    ELSE CAST(max_letter_count AS DOUBLE) / total_letters END AS top_frac,
               CASE WHEN total_letters = 0 THEN 0.0
                    ELSE CAST(sum_sq AS DOUBLE) / (total_letters * total_letters) END AS collision
        FROM tot"""


@query("ta16_char_collision", _ta16_sql())
def ta16_char_collision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution concentration per source: pooled a-z letter
    counts, the fraction taken by the most frequent letter, and the
    collision probability Σpᵢ² (the Rényi-2 / Simpson concentration — an
    entropy stand-in with NO transcendental functions, so it is exact
    integer arithmetic up to one final IEEE division and hashes
    identically on both engines; ln-based entropy would be libm-dependent).
    High collision or top_frac flags repetitive/gibberish sources the way
    an entropy filter would in a quality pipeline.

    Per-letter counts use the length-difference idiom (length(t) -
    length(replace(t, ch, ''))) — 26 fixed expressions, no per-character
    explode, so the doc row count never multiplies.

    Scale: entirely map-side expression work followed by one
    combine-friendly groupBy(source) over 26 integer sums — a fixed-width
    state regardless of document size; at 100 TB this runs at scan speed
    with a KB-sized shuffle."""
    docs = load(spark, sf_dir, "documents")
    t = F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")
    # The stripped text is BOUND once per row (r15): the 26 per-letter
    # count expressions each reference it twice, and codegen's
    # subexpression elimination does not catch every duplicate of the
    # regexp chain (measured 13% on the scan+agg stage).
    per_doc = docs.select(
        "source",
        bind(
            t,
            lambda tb: F.struct(
                *[
                    (F.length(tb) - F.length(F.replace(tb, F.lit(ch), F.lit("")))).alias(
                        f"c_{ch}"
                    )
                    for ch in _LETTERS
                ]
            ),
        ).alias("_s"),
    ).select("source", "_s.*")
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        *[F.sum(f"c_{ch}").alias(f"c_{ch}") for ch in _LETTERS],
    )
    total = sum((F.col(f"c_{ch}") for ch in _LETTERS[1:]), F.col("c_a"))
    nz = sum(
        (F.when(F.col(f"c_{ch}") > 0, 1).otherwise(0) for ch in _LETTERS[1:]),
        F.when(F.col("c_a") > 0, 1).otherwise(0),
    )
    maxc = F.greatest(*[F.col(f"c_{ch}") for ch in _LETTERS])
    sumsq = sum(
        (F.col(f"c_{ch}") * F.col(f"c_{ch}") for ch in _LETTERS[1:]),
        F.col("c_a") * F.col("c_a"),
    )
    tot = agg.select(
        "source",
        "n_docs",
        total.alias("total_letters"),
        nz.alias("distinct_letters"),
        maxc.alias("max_letter_count"),
        sumsq.alias("sum_sq"),
    )
    return tot.select(
        "source",
        "n_docs",
        "total_letters",
        F.col("distinct_letters").cast("int").alias("distinct_letters"),
        "max_letter_count",
        F.when(F.col("total_letters") == 0, F.lit(0.0))
        .otherwise(F.col("max_letter_count").cast("double") / F.col("total_letters"))
        .alias("top_frac"),
        F.when(F.col("total_letters") == 0, F.lit(0.0))
        .otherwise(
            F.col("sum_sq").cast("double")
            / (F.col("total_letters") * F.col("total_letters"))
        )
        .alias("collision"),
    )


@query(
    "ta17_langid_confusion",
    f"""WITH scores AS (
          SELECT doc_id, lang AS lang_declared,
                 CAST(len(list_filter({_TOKS}, x -> list_contains({_sql_list(_PROFILES["en"])}, x))) AS DOUBLE)
                   / greatest(len({_TOKS}), 1) AS en_score,
                 CAST(len(list_filter({_TOKS}, x -> list_contains({_sql_list(_PROFILES["es"])}, x))) AS DOUBLE)
                   / greatest(len({_TOKS}), 1) AS es_score,
                 CAST(len(list_filter({_TOKS}, x -> list_contains({_sql_list(_PROFILES["de"])}, x))) AS DOUBLE)
                   / greatest(len({_TOKS}), 1) AS de_score
          FROM documents),
        pred AS (
          SELECT lang_declared,
                 CASE WHEN en_score >= es_score AND en_score >= de_score THEN 'en'
                      WHEN es_score >= de_score THEN 'es'
                      ELSE 'de' END AS lang_pred
          FROM scores)
        SELECT lang_declared, lang_pred, COUNT(*) AS n_docs
        FROM pred GROUP BY lang_declared, lang_pred""",
)
def ta17_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation rollup for the language-ID heuristic: the
    (declared, predicted) confusion matrix over the whole corpus — the
    eval table behind precision/recall per language, and the companion
    of sim09/sim10's recall evals: every heuristic component in a
    curation pipeline ships with a measured confusion against labels,
    not an assumed one. (The 3-profile stopword heuristic cannot predict
    fr/zh — those rows land in the en/es/de columns and the matrix shows
    exactly that blind spot.)

    Scale: scoring is map-side higher-order-function work inside the
    scan; the rollup is a ≤|langs|² group count with map-side combine —
    observability at scan speed."""
    d = load(spark, sf_dir, "documents")
    t = tokens("text")
    n = F.greatest(F.size(t), F.lit(1))

    def score(lang: str):
        return F.size(F.filter(t, lambda x: x.isin(*_PROFILES[lang]))).cast("double") / n

    en, es, de = score("en"), score("es"), score("de")
    pred = F.when((en >= es) & (en >= de), "en").when(es >= de, "es").otherwise("de")
    return (
        d.select(F.col("lang").alias("lang_declared"), pred.alias("lang_pred"))
        .groupBy("lang_declared", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "ta18_keywords",
    f"""WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        scored AS (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 CAST(tf.tf AS DOUBLE) / df.df AS distinctiveness
          FROM tf JOIN df ON tf.token = df.token)
        SELECT doc_id, token, tf, df, distinctiveness, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY distinctiveness DESC, token) AS rank
          FROM scored) t
        WHERE rank <= 3""",
)
def ta18_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinctive keywords: rank each doc's tokens by
    tf/df — high term frequency in THIS doc, low document frequency
    across the corpus — and keep the top 3. This is TF-IDF ranking with
    the idf monotonicity shortcut: within one document, ordering by
    tf·idf(df) for any decreasing idf equals ordering by tf/df, so the
    transcendental log never enters and the score is ONE deterministic
    IEEE division (the [[oracle-dtype]] rule: no libm in oracled
    queries). Ties break on the token string.

    Scale: tf is a combine-friendly (doc, token) aggregate; df is the
    token histogram (same shuffle key as ta06's vocabulary, reusable);
    the join broadcasts df when the vocabulary fits (typical) and the
    top-3 plans as WindowGroupLimit under the per-doc window — no
    per-doc sort materializes more than the running top-3."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(df, "token").withColumn(
        "distinctiveness", F.col("tf").cast("double") / F.col("df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("distinctiveness"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "df", "distinctiveness", "rank")
    )
