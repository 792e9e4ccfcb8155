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
from ..functions.text import bind, md5_prefix_long, normalize_text, tokens, word_shingles


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


# ---------------------------------------------------------------------------
# Shared prefix-filtered pair machinery (r10)
#
# jaccard_pairs / containment_pairs / jaccard_truth_pairs all need "every
# doc pair whose shingle overlap clears a per-pair threshold".  The naive
# form — self-join the (doc, shingle) rows on shingle and count — shuffles
# Σ_s df(s)² pair rows, which goes quadratic once vocabulary saturates
# (measured at the local sf1 tier: 238M join rows for 1 713 qualifying
# pairs, wall-clock exponent 1.35/decade and climbing).  The machinery
# below is the LOSSLESS fix: AllPairs/PPJoin-style prefix filtering
# (Bayardo et al., WWW'07) lifted from single tokens to 2-shingle combo
# signatures, then exact verification by intersecting full shingle arrays.
# Output is IDENTICAL to the naive form at any threshold — the DuckDB
# oracles keep the naive SQL and hash parity is the proof
# (tests/test_llm_ops.py::test_containment_prefix_filter_lossless sweeps
# thresholds against an independent pure-Python reference).
# ---------------------------------------------------------------------------


def _doc_arrays(sh: DataFrame, id_col: str) -> DataFrame:
    """(id, shingles, n): per-doc shingle array in ascending GLOBAL
    (df, shingle) order — the canonical prefix-filtering order: rare
    shingles first, so prefixes shed the hot shingles that drive
    candidate volume on Zipfian corpora.  n = |distinct shingles|.

    The df join is pinned sort-merge (r13): dfreq is the corpus's
    distinct-shingle table — vocabulary-sized, i.e. O(corpus) — and
    AQE's runtime broadcast conversion (post-shuffle bytes under the
    64 MB session threshold) would happily broadcast it at small tiers
    and OOM the driver once the corpus grows (see _verified_overlaps
    for the measured failure of this pattern at the longdocs x32
    tier)."""
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    return (
        sh.hint("merge")
        .join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("ranked"))
        .select(
            F.col(id_col),
            F.transform("ranked", lambda s: s["shingle"]).alias("shingles"),
            F.size("ranked").alias("n"),
        )
    )


# Combo-emission bound: a doc on the combo path emits ≤ C(p,2) 8-byte
# keys where p is its INDEX-side prefix length, so p is capped at 256
# (≤ ~32k combos/doc); docs whose index prefix would be longer take the
# lossless single-shingle path (see _overlap_candidates docstring).
# For symmetric metrics (Jaccard) p ≈ (1-τ)·n + 2, so at τ = 0.8 docs up
# to ~1 270 distinct shingles stay on the combo path — the r10 form
# indexed ALL C(n,2) combos and had to cap n itself at 256.
_COMBO_MAX_PREFIX = 256


def _overlap_candidates(arr: DataFrame, id_col: str) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs, COMPLETE for every pair
    sharing ≥ 1 shingle whose true overlap ≥ the ``t`` column of its
    smaller side (callers derive t from their threshold; docs with t ≤ 1
    can qualify on a single shared shingle and take a direct
    shingle-equality path instead).  One qualification: the spill legs'
    ≥2-distinct-keys filter decides shingle distinctness on a 128-bit
    dual-xxhash64 key, so completeness there assumes no two distinct
    shingles of one qualifying pair collide on BOTH hashes — ~2⁻¹²⁸ per
    pair on non-adversarial text, and certifiable for a given corpus by
    the linear distinct-shingle == distinct-key check the tests pin
    (see the spill-leg comment below).  The combo and small legs carry
    no such assumption (their collisions only add candidates).

    Combo-prefix argument: a pair with n_common ≥ t ≥ 2 shares its 2
    globally-smallest common shingles s₁ < s₂, and within EITHER member
    only that doc's non-shared shingles can precede s₁ (every shared
    shingle is ≥ s₁ by definition of s₁), so s₂ sits at position
    ≤ n − n_common + 2 ≤ n − b + 2 for any per-doc lower bound b on the
    pair's overlap.  The probe role uses the caller's ``t`` column (the
    min-side bound — when the probe IS the min side its own t bounds the
    pair, otherwise the pair's bound is even higher and the prefix only
    over-covers).  The index role uses the SYMMETRIC bound ``ts`` when
    the caller provides one: for Jaccard, J ≥ τ and c ≤ min(n_a,n_b)
    give c(1+τ) ≥ τ(n_a+n_b) ≥ τ(max + c), i.e. c ≥ τ·max(n_a,n_b) ≥
    τ·n for EACH member — so the index emits only its first
    n − ceil(τ·n) + 2 positions' combos instead of all C(n,2) (r12;
    VERDICT r11 item 2).  Asymmetric metrics (containment: c ≥ τ·min
    only, the max side has no per-doc bound) pass no ``ts`` and the
    index emits all combos as before.  Both roles are emitted for every
    doc since the smaller side is unknown at plan time; for Jaccard
    t = ceil(2τ/(1+τ)·n) ≥ ts = ceil(τ·n), so the probe prefix is never
    longer than the index prefix.

    Combo emission is O(p²) per doc in its index-prefix length p, so p
    is BOUNDED: docs whose index prefix exceeds _COMBO_MAX_PREFIX spill
    to a SINGLE-shingle AllPairs leg instead — probe with the n − t + 1
    rarest shingles, index with the n − ts + 1 rarest (or all, when no
    symmetric bound exists), joined as 8-byte hashes.  Same rarest-
    common-shingle argument with "2 smallest" relaxed to "1 smallest";
    linear emission per doc, and the df-ranked prefixes shed the hot
    boilerplate shingles whose df² would otherwise dominate the join.
    Only t ≤ 1 docs — qualifiable on a single shared shingle — probe the
    full corpus inverted index (lossless for ANY threshold).  Without
    the cap, one pathological document (the maxvals layout's 1 MB text =
    ~140k distinct shingles) emits C(140k·(1−τ), 2) ≈ 10⁸⁻¹⁰ combos —
    the exact single-giant-row hazard a 100 TB corpus will contain.

    POSITIONAL (PPJoin, Xiao et al. WWW'08 §3.2) filtering was
    implemented on BOTH leg families in r16, MEASURED, and REJECTED —
    recorded here so it is not re-attempted without new evidence.  The
    bound is sound and lossless (a key matched at 1-based position j
    can only witness a pair with true overlap c ≤ 2 + min(n−j) across
    the two sides, while a qualifying pair's two rarest common
    shingles sit at j ≤ n−c+1 / n−c+2 in BOTH members, so their
    matches always survive), but on df-ranked prefixes it prunes
    almost nothing: matches concentrate on the RARE (early-position)
    shingles by construction, so deep-suffix matches are the
    exception.  Measured: combo leg at sf0.1 — 1.7% of match rows
    removed (513 715 → 505 187) for the cost of lifting the primitive
    long-array emission into array<struct> plus t/ts/rem join columns
    on ~12.6M emitted rows; dd18 wall 2.9 → ≥4.4 s.  Spill legs at
    longdocs x8/x16 (4 583/9 155 spilling docs, containment τ=0.3) —
    0.8%/1.0% of hit mass removed, wall flat at x8 and ~+15% at x16
    from the widened rows, output pair-identical.  See
    OPTIMIZATION_r16.md and tools/cand_volume.py for the full
    numbers."""
    symmetric = "ts" in arr.columns

    def combo_hashes(upto):
        # all xxhash64(h_i, h_j) for ordered positions i < j ≤ upto,
        # h = xxhash64(shingle) — generated map-side with higher-order
        # functions (no UDF), 8-byte keys so the candidate join shuffles
        # longs, not ~40-char shingle-pair strings.  IN THIS COMBO LEG
        # hash collisions only ADD candidates (any pair sharing one real
        # combo still meets on that combo's key — both sides derive the
        # key from the same shingle strings through the same function);
        # the verify stage is exact, so the output is unaffected.  The
        # spill legs below COUNT distinct keys, where a collision could
        # subtract — they key on 128 bits instead.
        #
        # Each prefix shingle is hashed ONCE and the O(p²) pairing mixes
        # fixed-width longs (r15: measured 28% faster emission than
        # hashing the string pair per combo).  The r10 form that
        # measured +20% WORSE pre-hashed into a separate column and
        # re-read it per outer element; the bind() binds the hashed
        # prefix once per row, so the nested lambdas see a variable, not
        # a re-evaluated expression.  (Still pinned from r10 measurement:
        # shuffle_hash on the candidate join OOMs building a 9M-row
        # LongHashedRelation.)  Deliberately a PRIMITIVE long array:
        # the r16 positional-filter experiment lifted each combo into a
        # (hash, position) struct and was REJECTED on measurement — see
        # the docstring's positional-filtering record.
        head_h = F.transform(F.slice("shingles", 1, upto), lambda s: F.xxhash64(s))
        return bind(
            head_h,
            lambda hh: F.flatten(
                F.transform(
                    hh,
                    lambda x, i: F.transform(
                        F.slice(hh, i + F.lit(2), F.greatest(upto - i - 1, F.lit(0))),
                        lambda y: F.xxhash64(x, y),
                    ),
                )
            ),
        )

    # index-side prefix: the symmetric bound when the caller derived one
    # (ts may fall below 2 for tiny n — least() clamps the prefix back to
    # the whole array, which only adds combos), else the full array.
    if symmetric:
        idx_upto = F.least(F.col("n"), F.col("n") - F.col("ts") + 2)
    else:
        idx_upto = F.col("n")
    combo_ok = (F.col("t") >= 2) & (idx_upto <= _COMBO_MAX_PREFIX)
    spill_ok = (F.col("t") >= 2) & (idx_upto > _COMBO_MAX_PREFIX)
    big = arr.filter(combo_ok)
    spill = arr.filter(spill_ok)
    small = arr.filter(F.col("t") <= 1)
    probe = big.select(
        F.col(id_col).alias("doc_p"),
        F.explode(combo_hashes(F.col("n") - F.col("t") + 2)).alias("combo"),
    )
    index = big.select(
        F.col(id_col).alias("doc_i"),
        F.explode(combo_hashes(idx_upto)).alias("combo"),
    )
    # Both join legs are post-explode (hundreds of combos per doc), which
    # Catalyst size-estimates from the tiny pre-explode array table — left
    # alone it plans a broadcast of the probe side and OOMs at sf1.  Both
    # sides are O(docs × combos): always a shuffle join, never broadcast.
    # sort-merge by hint: shuffle_hash OOMs building a 9M-row-per-partition
    # LongHashedRelation at sf1/8-partitions, and Catalyst's post-explode
    # size misestimate would otherwise pick broadcast (see below)
    combo_cand = (
        probe.hint("merge")
        .join(index, "combo")
        .filter(F.col("doc_p") != F.col("doc_i"))
        .select(
            F.least("doc_p", "doc_i").alias("doc_a"),
            F.greatest("doc_p", "doc_i").alias("doc_b"),
        )
    )
    # tiny leg: t ≤ 1 docs can qualify on a SINGLE shared shingle, so
    # their probes must see the entire corpus — full inverted-index join.
    # Pinned sort-merge (r13): the corpus shingle table is the RIGHT
    # side, and AQE's runtime conversion broadcast it whenever its
    # compressed shuffle bytes dipped under the threshold — an
    # O(corpus) build that cannot survive growth (at thresholds where
    # this leg is non-empty the probe side is small, but the build side
    # never is).
    #
    # The corpus side explodes the CHECKPOINTED array table (r15): arr's
    # shingle arrays are exactly the per-doc distinct shingles the raw
    # (doc, shingle) table holds — arr is built FROM it by collect_list —
    # so exploding arr is row-identical while reading the materialized
    # checkpoint instead of re-running the whole normalize→tokenize→
    # shingle pipeline over the corpus a second time (measured ~3-6 s of
    # CPU per query at sf0.1, paid even when ZERO docs have t ≤ 1).
    small_sh = small.select(F.col(id_col).alias("doc_s"), F.explode("shingles").alias("shingle"))
    corpus_sh = arr.select(F.col(id_col).alias("doc_o"), F.explode("shingles").alias("shingle"))
    small_cand = (
        small_sh.hint("merge")
        .join(corpus_sh, "shingle")
        .filter(F.col("doc_s") != F.col("doc_o"))
        .select(
            F.least("doc_s", "doc_o").alias("doc_a"),
            F.greatest("doc_s", "doc_o").alias("doc_b"),
        )
    )
    # spill legs (r12): t ≥ 2 docs whose index prefix overflows the combo
    # cap.  Their pairs need overlap ≥ 2, so the SINGLE-shingle AllPairs
    # prefix applies — but REQUIRING BOTH of the pair's two rarest
    # common shingles (r13): the combo argument bounds s₂'s position at
    # n − c + 2 ≤ n − t + 2 in the pair's min side and ≤ n − ts + 2 in
    # either member when a symmetric bound exists, so probing with the
    # first n − t + 2 shingles and indexing with the first n − ts + 2
    # (or all n for asymmetric metrics) guarantees a qualifying pair ≥ 2
    # DISTINCT shared keys in the leg where its min side probes.  The
    # pre-r13 form kept any pair sharing ONE prefix shingle, and the
    # longdocs x64 tier measured that candidate set superquadratic
    # (4.8k → 30k → 291k over x16/x32/x64 for dd18 while true output
    # stayed exactly linear): every mid-frequency shingle that survives
    # a df-ranked prefix pairs its df² document combinations.  Counting
    # DISTINCT shared keys ≥ 2 collapses that mass at a map-side partial
    # aggregate — the join volume itself is linear — while staying
    # lossless by the same two-rarest-common-shingles argument the combo
    # leg rests on.  Distinctness of the two keys is decided on a
    # 128-BIT key (r14): two independently-derived xxhash64 columns per
    # shingle, so dropping a true pair needs two distinct shingles to
    # collide on BOTH hashes (~2⁻¹²⁸ per pair) — at 10¹⁰⁺ distinct
    # shingles a single 64-bit key's birthday bound makes corpus-wide
    # collisions expected, which the pre-r14 form could only rule out by
    # asserting distinct-shingle == distinct-hash corpus-wide first.
    # That linear invariant check survives as a CANARY
    # (tests/test_llm_ops.py test_shingle_hash_distinctness_on_fixtures;
    # longdocs fixture build asserts it on the 128-bit key at the
    # Zipfian-vocabulary scale the legs actually target).  TWO joins
    # cover every pair with ≥ 1 spill member without
    # re-deriving combo×combo: S1 = spill docs probe vs ALL t ≥ 2 docs
    # indexed (covers min-side-spill pairs); S2 = combo docs probe vs
    # spill docs indexed (covers min-side-combo, max-side-spill pairs).
    # Both legs keep the shared key through the pair projection so the
    # ≥ 2 count dedups across legs/directions (a spill–spill pair meets
    # S1 twice, once per probing direction, with the SAME key values).
    # Shingles are hashed to a 16-byte (sh1, sh2) struct — 8 more
    # bytes/row than the combo leg's 64-bit keys buys the collision
    # margin above; on corpora where no doc overflows the cap both legs
    # are empty scans.
    big2 = arr.filter(F.col("t") >= 2)
    if symmetric:
        idx1_upto = F.least(F.col("n"), F.col("n") - F.col("ts") + 2)
    else:
        idx1_upto = F.col("n")

    def spill_key(s):
        # 128-bit key as TWO PRIMITIVE LONG COLUMNS: xxhash64(s) plus
        # xxhash64 of s chained behind a domain literal (a different
        # function of s — Spark's multi-arg xxhash64 folds each argument
        # into the running state).  Deliberately NOT a struct in the
        # AGGREGATE below: min/max over a struct falls out of
        # HashAggregate's fixed-width unsafe path into SortAggregate,
        # which SORTS the entire spill-hits mass — measured OOMing the
        # 8-thread/8g audit harness at longdocs x32/τ=0.1, the same
        # sort-the-quadratic-intermediate death the verify join's SMJ
        # alternative measured in r13.  Component-wise longs keep the
        # partial agg hash-based.
        return F.struct(
            F.xxhash64(s).alias("h1"),
            F.xxhash64(F.lit("spill-k2"), s).alias("h2"),
        )

    def single_probe(side: DataFrame) -> DataFrame:
        return side.select(
            F.col(id_col).alias("doc_p"),
            F.explode(
                F.transform(
                    F.slice("shingles", 1, F.col("n") - F.col("t") + 2),
                    spill_key,
                )
            ).alias("k"),
        ).select("doc_p", F.col("k.h1").alias("sh1"), F.col("k.h2").alias("sh2"))

    def single_index(side: DataFrame) -> DataFrame:
        return side.select(
            F.col(id_col).alias("doc_i"),
            F.explode(
                F.transform(F.slice("shingles", 1, idx1_upto), spill_key)
            ).alias("k"),
        ).select("doc_i", F.col("k.h1").alias("sh1"), F.col("k.h2").alias("sh2"))

    def pair_up(probe_df: DataFrame, index_df: DataFrame) -> DataFrame:
        # same post-explode size-misestimate hazard as the combo join:
        # force sort-merge, never broadcast an O(docs × shingles) side.
        # Joining on both longs (16-byte key) only TIGHTENS matching vs
        # the single-hash join; a real shared shingle always matches.
        return (
            probe_df.hint("merge")
            .join(index_df, ["sh1", "sh2"])
            .filter(F.col("doc_p") != F.col("doc_i"))
            .select(
                F.least("doc_p", "doc_i").alias("doc_a"),
                F.greatest("doc_p", "doc_i").alias("doc_b"),
                "sh1",
                "sh2",
            )
        )

    spill_hits = pair_up(single_probe(spill), single_index(big2)).unionByName(
        pair_up(single_probe(big), single_index(spill))
    )
    spill_cand = (
        # ≥ 2 distinct 128-bit keys ⟺ the group's rows are not all one
        # (sh1, sh2) value ⟺ min ≠ max on AT LEAST ONE component: four
        # primitive-long aggregates, one hash partial-agg pass, no
        # per-group distinct set and no struct buffer (see spill_key)
        spill_hits.groupBy("doc_a", "doc_b")
        .agg(
            F.min("sh1").alias("k1_lo"),
            F.max("sh1").alias("k1_hi"),
            F.min("sh2").alias("k2_lo"),
            F.max("sh2").alias("k2_hi"),
        )
        .filter((F.col("k1_lo") != F.col("k1_hi")) | (F.col("k2_lo") != F.col("k2_hi")))
        .select("doc_a", "doc_b")
    )
    return combo_cand.unionByName(small_cand).unionByName(spill_cand).distinct()


# Verify-join strategy boundary: thresholds at or above this stream
# (shuffled-hash verify, scales with the corpus); below it the arrays
# are broadcast (the loose-τ verify contract, bounded by memory).  r13
# placed it at 0.3 — the lowest threshold anyone had MEASURED linear.
# r14 located the actual knee (tools/tau_knee.py, longdocs x8→x32,
# SCALE.md "The τ knee"): candidate volume is linear at τ=0.2
# (242/486/991, exponents 1.01/1.03, candidates ≈ true pairs within
# 3%), BENDS at τ=0.15 (245/553/1693 — exponent 1.17 then 1.61 and
# climbing, candidate excess over true pairs 5→73→733), and is
# quadratic by τ=0.1 (590/2783/12655, exponents 2.24/2.18 against
# exactly-linear true output).  The knee is AT ≈0.15 on this corpus
# shape; 0.2 is the measured-linear side immediately above it, so the
# boundary streams everything the data says scales and nothing the
# data says bends.  A mid-τ job below 0.2 lands on the broadcast side
# by design: its candidate volume grows superlinearly and only the
# bounded-broadcast verify contract survives that regime (see
# _verified_overlaps).
#
# Shape robustness (r15, SCALE.md "The τ knee on a second corpus
# shape"): the same sweep on the OPPOSITE df-distribution (shortdocs —
# median 60 tokens, flat Zipf(0.7) over a 10k vocabulary) measures
# candidates ≡ true pairs (exponent 1.00) at every τ ∈ {0.05, 0.1,
# 0.15, 0.2, 0.3}, with the first excess appearing only at τ=0.02
# (244/501/1102 vs 240/480/964 true — top exponent 1.14).  The knee
# MOVES DOWN as the vocabulary flattens (boilerplate shingles are what
# leak through loose prefixes), so 0.2 sits above the knee on every
# realistic measured shape and the longdocs placement is the
# conservative one.  The adversarial direction (r15, boilerdocs —
# Zipf 1.3, saturation beyond any realistic web tail) measures
# quadratic candidates at EVERY τ ∈ {0.2, 0.25, 0.3} (exponents
# 2.04-2.07): on a saturated corpus no boundary constant helps, because
# even each doc's rarest shingles are hot and candidates are
# lower-bounded by Σdf².  Such jobs must use LSH discovery (dd02/dd03)
# with the pair operators as verify-only and pin verify="broadcast"
# (see _resolve_verify; SCALE.md "The adversarial shape").
STREAM_VERIFY_MIN_TAU = 0.2


def _resolve_verify(verify: str, threshold: float) -> bool:
    """Map the per-corpus ``verify`` override to the stream flag.

    "auto" applies the measured default boundary (τ ≥
    STREAM_VERIFY_MIN_TAU streams).  The explicit values exist because
    the boundary's placement is a property of the CORPUS SHAPE, not
    just of τ (r15, SCALE.md "The τ knee on the adversarial shape"): on
    a boilerplate-saturated corpus (Zipf 1.3 — heavier than any
    realistic web tail) even τ=0.2 measures a superlinear candidate
    volume, and such a job should pass verify="broadcast" to keep the
    bounded-memory verify contract; conversely verify="stream" forces
    the corpus-scaling plan where a caller has measured their shape
    linear below the default boundary (e.g. flat-vocabulary corpora,
    where the knee sits at τ≈0.02).  tools/tau_knee.py --shape measures
    the curve for a new corpus shape in one command."""
    if verify == "auto":
        return float(threshold) >= STREAM_VERIFY_MIN_TAU
    if verify == "stream":
        return True
    if verify == "broadcast":
        return False
    raise ValueError(f"verify must be 'auto', 'stream' or 'broadcast', got {verify!r}")


def _verified_overlaps(
    cand: DataFrame, arr: DataFrame, id_col: str, stream_verify: bool
) -> DataFrame:
    """Exact verification: (doc_a, doc_b, n_a, n_b, n_common) with
    n_common = |A∩B| from intersecting the two full shingle arrays
    (distinct per doc, so set semantics hold) — integer counts,
    engine-exact; pairs sharing no real shingle (possible via hash
    collisions in candidate generation) drop out at n_common ≥ 1.

    The join strategy is chosen BY REGIME (r13), because the longdocs
    x16/x32 tiers measured every one-size-fits-all choice failing:

    * Unpinned, AQE's runtime broadcast conversion judged the array
      side by COMPRESSED shuffle bytes (under the 64 MB session
      threshold at x8/x16) and broadcast it; at x32 (32k docs, ~26 MB
      compressed, ~330 MB of raw arrays) building TWO concurrent
      driver hash relations exceeded the 8 GiB driver
      (notEnoughMemoryToBuildAndBroadcastTableError).  The
      compressed-bytes-vs-hash-relation expansion is ~10-40× for
      shingle-array rows, so the threshold check systematically
      underestimates the build.
    * Pinned sort-merge, the second join must SORT the candidate ×
      sh_a intermediate — every candidate row dragging a multi-KB
      array.  In the quadratic verify regime (~10⁸ candidates at
      longdocs x16, τ=0.02) the executor died of heap exhaustion.
    * Pinned shuffled-hash (arrays built per partition), candidates
      stream without sorting — but the second join still SHUFFLES the
      candidate × sh_a intermediate, and at τ=0.02/x16 that spill
      filled a 250 GB disk.  Only array-side broadcast avoids moving
      arrays per candidate, which is why the broadcast plan is the
      only one that ever completed the quadratic regime.

    So: ``stream_verify=True`` (discovery thresholds, candidate volume
    measured near-linear in the corpus) pins shuffled-hash with the
    array side as build — candidates stream unsorted, the per-
    partition build is O(docs/partitions), nothing is driver-sized,
    and the array-laden intermediate is O(pairs) ≈ O(corpus).
    ``stream_verify=False`` (loose-τ verify) BINDS a broadcast of the
    array tables: the only plan whose candidate-side cost is O(pairs ×
    16 bytes), at the documented price that the array table must fit
    in memory.  That price is the operator's contract, not a bug: at
    100 TB, loose-τ exact verify runs on an LSH/blocking-bounded
    candidate set whose doc subset (and hence broadcast) is bounded —
    corpus-wide loose-τ verification is the Σ df(s)² quadratic floor
    no plan shape can remove (SCALE.md).  Arrays are dropped in the
    same stage right after array_intersect either way."""
    va = arr.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"), F.col("n").alias("n_a"))
    vb = arr.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"), F.col("n").alias("n_b"))
    if stream_verify:
        va, vb = va.hint("shuffle_hash"), vb.hint("shuffle_hash")
    else:
        va, vb = F.broadcast(va), F.broadcast(vb)
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .filter(F.col("n_common") >= 1)
        .select("doc_a", "doc_b", "n_a", "n_b", "n_common")
    )


# Slack subtracted inside ceil() when the per-doc overlap requirement t
# comes from FLOAT threshold math: it can only round t DOWN by one in the
# razor's-edge case where τ·n lands within 1e-9 of an integer, which adds
# candidates (lossless) — whereas a float wobble UP would shorten the
# prefix and silently drop a boundary pair that the output filter's own
# IEEE comparison accepts.
_T_SLACK = 1e-9


def attach_overlap_bounds(arr: DataFrame, t_frac: float, ts_frac: float) -> DataFrame:
    """Attach the prefix-filter overlap bounds to a ``_doc_arrays``
    frame: ``t`` = ceil(t_frac·n − slack) (the overlap a partner must
    share when THIS doc is the smaller side) and ``ts`` =
    ceil(ts_frac·n − slack) (the symmetric index-side bound, r12).

    Single source of truth for the t/ts column derivation — used by
    ``jaccard_pairs``/``jaccard_truth_pairs`` AND by tools/tau_knee.py,
    so the knee tool counts exactly the candidate set the shipped
    pipeline generates (a drifted re-derivation there would silently
    measure a different candidate volume while labeling it shipped)."""
    return (
        arr.withColumn(
            "t", F.ceil(F.lit(float(t_frac)) * F.col("n") - F.lit(_T_SLACK)).cast("int")
        ).withColumn(
            "ts", F.ceil(F.lit(float(ts_frac)) * F.col("n") - F.lit(_T_SLACK)).cast("int")
        )
    )


def jaccard_overlap_bounds(arr: DataFrame, threshold: float) -> DataFrame:
    """Bounds implied by Jaccard ≥ τ: t_frac = 2τ/(1+τ) (min-side,
    lossless — see jaccard_pairs docstring), ts_frac = τ (symmetric)."""
    tau = float(threshold)
    return attach_overlap_bounds(arr, 2.0 * tau / (1.0 + tau), tau)


# Pre-spread the array table before checkpointing when the index-side
# prefix covers at least this fraction of each doc's shingles.  Combo
# emission is O(prefix²) per doc, so when prefixes are near-full (every
# asymmetric metric, and loose-τ Jaccard) the explode stages carry 10-20×
# the checkpoint's bytes as CPU — but AQE coalesces the groupBy output by
# its (small, pre-explode) BYTE size, leaving the explode on a handful of
# partitions.  Measured interleaved at sf0.1 (r15): dd18 (containment,
# full index prefix) 3.20 → 2.14 s with arr at defaultParallelism, while
# dd22 (τ=0.5 Jaccard, quarter-volume combos) measured best left to AQE
# (1.17 vs 1.37 s — task overhead exceeds the parallelism win).  The
# boundary is PLAN-TIME knowable from ts_frac: (1 − ts_frac) ≥ 0.6 means
# near-full prefixes → spread.  Same repartition contract as _spread (the
# shingle stage), over a strictly smaller table.
_ARR_SPREAD_MIN_IDX_FRAC = 0.6


def _maybe_spread_arr(arr: DataFrame, id_col: str, tau: float | None) -> DataFrame:
    """``tau`` is the caller's RAW similarity threshold (None for
    asymmetric metrics, which have no symmetric bound) — NOT the
    symmetric prefix bound ts = 2τ/(1+τ).  1 − τ approximates the
    index-prefix fraction (exact: (n − ceil(τ·n) + 2)/n → 1 − τ for
    large n), which is what the spread boundary tests (r15 ADVICE:
    the old name ``ts_frac`` invited passing ts and silently shifting
    the 0.6 boundary)."""
    idx_frac = 1.0 if tau is None else 1.0 - float(tau)
    if idx_frac < _ARR_SPREAD_MIN_IDX_FRAC:
        return arr
    return arr.repartition(arr.sparkSession.sparkContext.defaultParallelism, id_col)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    verify: str = "auto",
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle:
    (doc_a, doc_b, jaccard) with jaccard ≥ threshold.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) — integer counts, one double
    division, so the value is engine-exact.  J ≥ τ with A the smaller
    side implies |A∩B| ≥ τ(|A|+|B|)/(1+τ) ≥ 2τ/(1+τ)·|A|, which is the
    per-doc overlap requirement fed to the shared prefix-filtered
    candidate machinery (see _overlap_candidates; lossless).  Jaccard is
    SYMMETRIC — J ≥ τ also forces |A∩B| ≥ τ·max(|A|,|B|) — so ``ts`` =
    ceil(τ·n) is attached as the index-side prefix bound (r12), keeping
    long docs on the combo path instead of the single-shingle fallback."""
    sh = shingle_rows(docs, id_col, text_col, k)
    arr = checkpoint(
        _maybe_spread_arr(
            jaccard_overlap_bounds(_doc_arrays(sh, id_col), threshold), id_col, threshold
        )
    )
    return (
        _verified_overlaps(
            _overlap_candidates(arr, id_col),
            arr,
            id_col,
            stream_verify=_resolve_verify(verify, threshold),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_truth_pairs(
    docs: DataFrame,
    j_num: int,
    j_den: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    verify: str = "auto",
) -> DataFrame:
    """(doc_a, doc_b, n_a, n_b, n_common) for pairs with
    j_den·c ≥ j_num·(n_a + n_b − c) — the cross-multiplied INTEGER
    Jaccard threshold eval legs use (no float edge; dd21's ground
    truth).  Same lossless candidate machinery: the threshold implies
    c ≥ j_num(n_a+n_b)/(j_num+j_den) ≥ 2·j_num/(j_num+j_den)·min, and
    the rational per-doc bound is ≥ 1/13 away from any integer so plain
    float ceil cannot cross a boundary (slack kept anyway — it only
    loosens).  Symmetric index bound (r12): c ≤ min makes the union
    n_a+n_b−c ≥ max, so j_den·c ≥ j_num·max ⇒ c ≥ j_num/j_den·max, and
    ``ts`` = ceil(j_num/j_den·n) prunes the index-side combos."""
    sh = shingle_rows(docs, id_col, text_col, k)
    # Rational fracs computed exactly as before the r15 factoring:
    # 2·j_num/(j_num+j_den) and j_num/j_den (NOT re-derived through a
    # float τ, which could differ in the last ulp).
    arr = checkpoint(
        _maybe_spread_arr(
            attach_overlap_bounds(
                _doc_arrays(sh, id_col), 2.0 * j_num / (j_num + j_den), j_num / j_den
            ),
            id_col,
            j_num / j_den,
        )
    )
    return _verified_overlaps(
        _overlap_candidates(arr, id_col),
        arr,
        id_col,
        stream_verify=_resolve_verify(verify, j_num / j_den),
    ).filter(
        F.lit(j_den) * F.col("n_common")
        >= F.lit(j_num) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
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
    verify: str = "auto",
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

    Plan (r10): LOSSLESS prefix-filtered candidate generation instead of
    the raw shared-shingle self-join.  The self-join's pair volume is
    Σ_s df(s)² — measurably quadratic once vocabulary saturates (238M
    join rows for 1 713 output pairs at the local sf1 tier) — while a
    qualifying pair must share ≥ ceil(τ·min(n_a,n_b)) ≥ 2 shingles, so
    joining on 2-shingle combo signatures drawn from df-ordered prefixes
    (AllPairs/PPJoin prefix filtering lifted to combos) shrinks the
    candidate set to pairs sharing ≥ 2 shingles (~20× fewer here;
    far more on Zipfian corpora where prefixes shed the hot shingles).
    Candidates are then verified exactly via array_intersect on the full
    per-doc shingle arrays, so the output is IDENTICAL to the self-join
    formulation — the DuckDB oracle keeps the naive SQL form and hash
    parity is the proof.

    Scale: combo emission is map-side from a per-doc array table (one
    groupBy of shingle rows); the candidate join shuffles 8-byte hashed
    combo keys; verification joins the (small) distinct-candidate set
    back to doc arrays.  Still a verify-stage operator by contract —
    discovery at 100 TB goes through LSH/blocking — but the exact form
    now survives corpus growth that the self-join could not."""
    sh = shingle_rows(docs, id_col, text_col, k)
    # t = ceil(τ·n) is the overlap a partner must share when THIS doc is
    # the smaller side of a pair (n_common ≥ τ·min ⇔ n_common ≥
    # ceil(τ·min)); docs with t ≤ 1 (tiny docs — or every doc at τ=0)
    # can qualify on a single shared shingle and take the direct path
    # inside _overlap_candidates.
    arr = checkpoint(
        _maybe_spread_arr(
            _doc_arrays(sh, id_col).withColumn(
                "t", F.ceil(F.lit(float(threshold)) * F.col("n") - F.lit(_T_SLACK)).cast("int")
            ),
            id_col,
            None,  # asymmetric: no symmetric index bound, full prefixes
        )
    )
    return (
        _verified_overlaps(
            _overlap_candidates(arr, id_col),
            arr,
            id_col,
            stream_verify=_resolve_verify(verify, threshold),
        )
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
