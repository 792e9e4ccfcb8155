"""Deduplication operators for LLM training-data pipelines: exact,
MinHash(+LSH), SimHash, and n-gram Jaccard — all as compositions of
built-in DataFrame ops (no Python UDFs; every hash is md5-based so the
DuckDB oracle can reproduce it, see functions/text.py).

Scale design (100 TB):
  * exact dedup — one hash-shuffle on a 16-byte key; the canonical-id
    aggregate is map-side combinable.
  * MinHash+LSH — signatures are |docs|×num_hashes rows (explode + partial
    min-agg keeps the shuffle at signature size, not shingle size);
    candidate generation joins on (band, band_key) buckets, so cost is
    bucket-local and never quadratic in |docs|.
  * n-gram Jaccard — the shingle self-join IS quadratic in colliding docs;
    it is the verification stage applied to LSH candidates (or small data),
    never the discovery stage at scale.
  * SimHash — linear: explode tokens × bit positions, two partial-agg
    shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import checkpoint
from ..functions.text import md5_prefix_long, normalize_text, tokens, word_shingles


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group documents by md5 of normalized text; one row per distinct
    content with the canonical (min) id and the duplicate count."""
    return (
        docs.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_doc_id"), F.count("*").alias("n_docs"))
    )


def _spread(docs: DataFrame, id_col: str) -> DataFrame:
    """Small-file inputs arrive as one split; shingling/hashing is
    compute-bound, so spread rows across all cores first (the tiny shuffle
    beats single-task execution ~10×; on a real cluster with many splits
    this is a no-op cost-wise)."""
    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, id_col)


def shingle_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) rows — distinct word k-grams per document."""
    return _spread(docs, id_col).select(
        F.col(id_col), F.explode(word_shingles(text_col, k)).alias("shingle")
    )


MINHASH_MOD = 2_147_483_647  # 2^31 - 1

# Default hot-bucket cap for LSH candidate discovery: buckets wider than
# this switch from all-pairs to star pairing (see lsh_candidate_pairs).
# Shared by the plans layer and its DuckDB oracles.
DEFAULT_MAX_BUCKET_WIDTH = 10


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) multiply-shift coefficients per hash, derived
    from md5 so the SQL oracle can embed the identical literals."""
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"a|{i}".encode()).hexdigest()[:8], 16) % (MINHASH_MOD - 1) + 1
        b = int(hashlib.md5(f"b|{i}".encode()).hexdigest()[:8], 16) % MINHASH_MOD
        out.append((a, b))
    return out


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Long-form MinHash: (doc_id, seed, minhash) where minhash_i =
    min over shingles of ((a_i * h + b_i) mod 2^31-1), h = base md5 hash
    of the shingle.

    Perf shape: ONE md5 per shingle (not num_hashes), then num_hashes
    integer mixes evaluated as parallel MIN aggregates in a single
    hash-aggregate pass — no row explosion, one shuffle of |docs| rows ×
    num_hashes columns, unpivoted to long form afterwards."""
    sh = shingle_rows(docs, id_col, text_col, k)
    h = md5_prefix_long(F.col("shingle"), 15) % MINHASH_MOD
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    wide = sh.withColumn("h", h).groupBy(id_col).agg(*mins)
    stack_args = ", ".join(f"{i}, m{i}" for i in range(num_hashes))
    return wide.selectExpr(
        id_col, f"stack({num_hashes}, {stack_args}) AS (seed, minhash)"
    ).withColumn("seed", F.col("seed").cast("long"))


def lsh_band_keys(signatures: DataFrame, rows_per_band: int = 4, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, band_key): md5 over the band's minhashes in seed
    order. Docs sharing a band_key agree on all rows of that band."""
    return (
        signatures.withColumn("band", F.expr(f"seed div {rows_per_band}"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_key")
        )
    )


def lsh_candidate_pairs(
    band_keys: DataFrame, id_col: str = "doc_id", max_bucket_width: int | None = None
) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs sharing ≥1 LSH bucket (doc_a < doc_b).

    Scale: the self-join is on (band, band_key) — bucket-local; skewed
    buckets (boilerplate text shared by millions of pages) are the known
    hazard: an uncapped bucket of width W emits W·(W-1)/2 pairs.  With
    ``max_bucket_width`` set, buckets wider than the cap switch from
    all-pairs to STAR pairing — every member pairs only with the bucket's
    canonical (min-id) member, emitting W-1 pairs.  Star pairing keeps the
    bucket connected (connected-components clustering, dd07, resolves the
    same clusters) while bounding pair output linearly in bucket width;
    the lost non-canonical edges only matter to per-pair verify stages,
    which at that width are re-verifying the same boilerplate anyway.
    Deterministic (min-id hub), so a SQL oracle reproduces it exactly.
    """
    a = band_keys.select(
        F.col(id_col).alias("doc_a"), F.col("band").alias("band_a"), F.col("band_key").alias("key_a")
    )
    b = band_keys.select(
        F.col(id_col).alias("doc_b"), F.col("band").alias("band_b"), F.col("band_key").alias("key_b")
    )
    if max_bucket_width is None:
        return (
            a.join(
                b,
                on=(a["band_a"] == b["band_b"]) & (a["key_a"] == b["key_b"]) & (a["doc_a"] < b["doc_b"]),
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
    # Width/hub as a window over the bucket key: one shuffle on
    # (band, band_key), no join back against a second computation of the
    # minhash lineage. The localCheckpoint then materializes the keyed
    # table once, so the narrow self-join below scans the stored rows
    # twice instead of re-running shingle→md5→minhash three more times.
    bucket = Window.partitionBy("band", "band_key")
    keyed = band_keys.withColumn("_width", F.count("*").over(bucket)).withColumn(
        "_hub", F.min(id_col).over(bucket)
    )
    try:
        keyed = checkpoint(keyed)
    except Exception:
        pass  # checkpoint is an optimization; semantics identical without it
    narrow = keyed.filter(F.col("_width") <= max_bucket_width)
    na = narrow.select(
        F.col(id_col).alias("doc_a"), F.col("band").alias("band_a"), F.col("band_key").alias("key_a")
    )
    nb = narrow.select(
        F.col(id_col).alias("doc_b"), F.col("band").alias("band_b"), F.col("band_key").alias("key_b")
    )
    narrow_pairs = na.join(
        nb,
        on=(na["band_a"] == nb["band_b"]) & (na["key_a"] == nb["key_b"]) & (na["doc_a"] < nb["doc_b"]),
    ).select("doc_a", "doc_b")
    star_pairs = (
        keyed.filter((F.col("_width") > max_bucket_width) & (F.col(id_col) != F.col("_hub")))
        .select(F.col("_hub").alias("doc_a"), F.col(id_col).alias("doc_b"))
    )
    return narrow_pairs.unionByName(star_pairs).distinct()


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle:
    (doc_a, doc_b, jaccard) with jaccard ≥ threshold.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) — integer counts, one double
    division, so the value is engine-exact."""
    sh = shingle_rows(docs, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, on=["shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over token hashes
    (tokens weighted by multiplicity). Integer-only math → portable."""
    tok = _spread(docs, id_col).select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tok = tok.withColumn("h", md5_prefix_long(F.col("tok")))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    # SQL-expr form: the pyspark shiftright/shiftleft wrappers only accept a
    # Python-int shift, but the underlying SQL expressions take columns.
    votes = (
        tok.select(F.col(id_col), F.col("h"), bit)
        .groupBy(id_col, "b")
        .agg(F.sum(F.expr("(shiftright(h, cast(b AS INT)) & 1) * 2 - 1")).alias("vote"))
    )
    return (
        votes.withColumn("bit", F.when(F.col("vote") > 0, 1).otherwise(0))
        .groupBy(id_col)
        .agg(F.sum(F.expr("shiftleft(cast(bit AS BIGINT), cast(b AS INT))")).alias("simhash"))
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT over pairs sharing ≥1 shingle:
    containment = |A∩B| / min(|A|, |B|) — the quote/subset detector.
    A short document pasted inside a long one scores containment ≈ 1
    while its Jaccard stays low (the union is dominated by the long
    doc), so Jaccard-threshold dedup systematically misses it; corpus
    pipelines run both metrics over the same candidate pairs. Jaccard is
    reported alongside so the asymmetric catches are visible
    (containment ≥ τ AND jaccard < τ). Integer counts, IEEE divisions —
    engine-exact.

    Scale: same verify-stage contract as jaccard_pairs — candidate-
    scoped, never the discovery stage; the shingle equi-join and both
    size joins shuffle on doc keys."""
    sh = shingle_rows(docs, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, on=["shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment", "jaccard")
    )
