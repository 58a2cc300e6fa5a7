"""Deduplication operators for large-scale corpus curation.

All hashing is engine-portable (md5-derived 60-bit integers) so results
are reproducible across engines and cluster restarts — no dependence on
Spark's internal hash seeds.  Everything is built from JVM-side
higher-order functions (transform/aggregate/array_min): zero Python in
the hot path, one shuffle per logical step.

Scale notes (100 TB):
- minhash signatures are computed map-side (no shuffle); the only
  shuffles are the band-bucket explode+groupBy (keys are uniformly
  distributed md5s — no skew) and the candidate-pair self-join, whose
  size LSH keeps near-linear in the number of true near-dupes.
- exact dedup is a single hash-groupBy; Spark's AQE handles skew from
  pathological duplicate-heavy corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.
    Portable: DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words(col: Column) -> Column:
    """Whitespace tokenization (empty-token free)."""
    return F.split(F.trim(col), r"\s+")


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column; a text shorter than k
    words contributes its whole token sequence as one shingle.

    Implemented as a zero-width-lookahead regexp_extract_all (capture
    the next k words at each word start) instead of an array-lambda
    transform: higher-order functions are CodegenFallback (interpreted
    per element), while regexp_extract_all runs inside whole-stage
    codegen — measured ~5x faster on the documents table."""
    s = F.regexp_replace(F.trim(col), r"\s+", " ")
    kwords = " ".join([r"\S+"] * k)
    sh = F.regexp_extract_all(s, F.lit(rf"(?<![^\s])(?=({kwords}))"), 1)
    return F.array_distinct(
        F.when(F.size(sh) > 0, sh).otherwise(F.array(s))
    )


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams (zero-width lookahead captures the
    n chars at every offset — JVM regex, whole-stage codegen; see
    word_shingles for why not an array lambda)."""
    grams = F.regexp_extract_all(col, F.lit(rf"(?s)(?=(.{{{n}}}))"), 1)
    return F.array_distinct(
        F.when(F.size(grams) > 0, grams).otherwise(F.array(col))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / union.cast("double")


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups: md5-hash groupBy — the canonical 100 TB
    dedup plan (single shuffle on a uniform 128-bit key)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---- the MinHash lane family -------------------------------------------
#
# hash_j(s) = (A_j * x(s) + B_j) mod P,  P = 2^31 - 1 (Mersenne),
# x(s) = first 32 md5 bits of the shingle, A_j in [1, P-1] and B_j in
# [0, P-1] md5-derived per-lane literal constants — the classic
# pairwise-independent affine family (the same construction Spark
# MLlib's MinHashLSH uses).  One digest per shingle, num_hashes cheap
# affine maps.
#
# Why not the previous hash_j = h1 + j*h2 (two md5 lanes, affine in
# j): that family shares ONE (h1, h2) draw across every lane, so a
# shingle whose h1 AND h2 are both small is the argmin of EVERY lane
# simultaneously — cross-lane correlation that turned a
# jaccard-0.9 pair's theoretical miss probability of ~2e-6
# ((1-s^2)^bands) into ~1/|shingles| whenever the pair's one
# differing shingle drew small lanes.  Found live on the sf0.01
# corpus: docs 26/455 (9 of 10 shingles shared) agreed on ZERO of 16
# lanes.  With independent per-lane (A_j, B_j), lane argmins
# decorrelate and the miss bound holds
# (tests/test_dedup_recall.py pins it).
#
# Overflow (ANSI mode errors, not wraps): A_j in [1, P-1] and
# x < 2^32, so A_j*x + B_j <= (P-1)*(2^32-1) + (P-1) = (P-1)*2^32
# ≈ 9.22e18 < 2^63 - 1, inside signed 64.  All
# integer arithmetic, one shared SQL string for both engines
# (minhash_lane_sql) — the hdr_bucket_sql discipline.

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def _mh_const(tag: str, j: int, span: int, lo: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"{tag}{j}".encode()).hexdigest()[:15], 16)
    return h % span + lo


def minhash_lane_consts(j: int) -> tuple:
    """(A_j, B_j) for lane j — md5-derived literals, A_j != 0."""
    p = MINHASH_PRIME
    return _mh_const("mha", j, p - 1, 1), _mh_const("mhb", j, p, 0)


def minhash_lane_sql(x: str, j: int) -> str:
    """Lane-j hash of a nonnegative 32-bit BIGINT expression — ONE
    string rendered identically for Spark SQL and DuckDB."""
    a, b = minhash_lane_consts(j)
    return f"(({a} * {x} + {b}) % {MINHASH_PRIME})"


def _minhash_signatures(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(doc_id, shingles) -> (doc_id, sig0..sigN-1).

    Signature via explode + groupBy-min rather than array lambdas:
    higher-order functions evaluate interpreted per element, while
    this shape is whole-stage codegen with map-side partial min —
    also exactly the plan that scales (shuffle carries one row per
    doc x num_hashes longs).  ONE md5 per shingle; the per-lane
    values are the affine-mod family above (fixed-width long agg
    buffers — string min buffers copy the whole UnsafeRow per
    update, measured ~7x on the signature stage at sf1).

    explode_OUTER on purpose: whole-stage-codegen GenerateExec
    inlines the generator expression and re-evaluates the shingling
    regex per OUTPUT row (O(shingles^2) per doc); outer routes to the
    row-at-a-time GenerateExec which evaluates the array once per
    input row.  word_shingles never yields an empty array, so outer
    adds no null rows — the filter is belt-and-braces."""
    hashed = (
        sh.select("doc_id", F.explode_outer("shingles").alias("s"))
        .filter(F.col("s").isNotNull())
        .withColumn(
            "x",
            F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long"),
        )
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(F.expr(minhash_lane_sql("x", j))).alias(f"sig{j}")
            for j in range(num_hashes)
        ]
    )


def _band_struct_array(num_hashes: int, bands: int):
    """Band keys straight off the signature columns — no join back to
    the shingle relation, and the bucket rows carry ONLY
    (doc_id, band, bkey).  At 100 TB the candidate-pair exchange is
    then id-pairs, not pairs of full shingle arrays."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "-",
                        *[F.col(f"sig{b * rows_per_band + r}").cast("string")
                          for r in range(rows_per_band)]
                    )
                ).alias("bkey"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs.

    shingle -> minhash -> band-bucket -> bucket self-join -> exact
    Jaccard verification.  Returns (id_a, id_b, jaccard) with
    id_a < id_b, jaccard >= threshold.
    """
    assert num_hashes % bands == 0

    # Shingling + hashing is CPU-heavy and runs MAP-SIDE (partial min
    # before the signature exchange), so it inherits the SCAN's split
    # count — snappy parquet byte-planning gave a 50k-doc corpus 2
    # splits on 32 cores (measured: the whole hash family computed on
    # 2 tasks).  Retune split sizing to cluster parallelism first.
    from mtail_spark.session import ensure_parallelism

    df = ensure_parallelism(df, df.sparkSession)

    # NOT persisted: the relation feeds three consumers, but shingling
    # is codegen-cheap (regexp_extract_all), while caching a
    # corpus-scale array<string> relation is memory-hostile at 100 TB
    # and repeated persist() calls on equivalent plans layered
    # cache-on-cache (InMemoryRelation over InMemoryRelation), making
    # every re-run slower than the last.  Recompute from the scan —
    # the standard scale choice.
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    sigs = _minhash_signatures(sh, num_hashes)
    band_structs = _band_struct_array(num_hashes, bands)
    # persist: the candidate self-join consumes buckets TWICE; without
    # this the whole shingle->hash->min pipeline runs once per side.
    # bands x docs rows of (id, band, 32-char key) — corpus-fraction
    # sized NARROW relation, safe to cache at 100 TB.
    from pyspark import StorageLevel

    buckets = sigs.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", "bb.band", "bb.bkey").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verification: join the deduped id pairs back to the persisted
    # shingle relation once per side (pairs are near-dup-count sized,
    # so AQE broadcasts them against the corpus-sized shingle side).
    return (
        pairs.join(
            sh.select(F.col("doc_id").alias("id_a"),
                      F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"),
                      F.col("shingles").alias("sh_b")),
            "id_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def incremental_minhash_dups(
    new_df: DataFrame,
    base_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Delta dedup: flag documents in `new_df` that near-duplicate
    anything already in `base_df` — the shape of every growing-corpus
    ingestion pipeline (today's crawl against the accumulated corpus;
    re-running the full self-join per increment is quadratic in
    corpus history).  Returns (new_id, base_id, jaccard) with
    jaccard >= threshold; duplicates WITHIN the new shard are
    minhash_lsh_pairs on new_df alone, deliberately not repeated here.

    Same signature family / band keys as minhash_lsh_pairs (one md5
    per shingle, the affine-mod lane family above), so at 100 TB the
    base side's
    buckets are a precomputed, bucketed-by-(band, bkey) TABLE the
    increment just joins against: base text is never rescanned, the
    join is new-shard-sized on one side, and only verification
    fetches the candidate base shingles.  Here both sides derive from
    their scans; no persist — each bucket relation feeds exactly one
    join."""
    assert num_hashes % bands == 0
    from mtail_spark.session import ensure_parallelism

    spark = new_df.sparkSession

    def prep(df):
        sh = ensure_parallelism(df, spark).select(
            F.col(id_col).alias("doc_id"),
            word_shingles(F.col(text_col), shingle_k).alias("shingles"),
        )
        buckets = (
            _minhash_signatures(sh, num_hashes)
            .select(
                "doc_id",
                F.explode(_band_struct_array(num_hashes, bands)).alias(
                    "bb"
                ),
            )
            .select("doc_id", "bb.band", "bb.bkey")
        )
        return sh, buckets

    sh_new, bk_new = prep(new_df)
    sh_base, bk_base = prep(base_df)
    cand = (
        bk_new.alias("n")
        .join(
            bk_base.alias("b"),
            (F.col("n.band") == F.col("b.band"))
            & (F.col("n.bkey") == F.col("b.bkey")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("b.doc_id").alias("base_id"),
        )
        .dropDuplicates(["new_id", "base_id"])
    )
    return (
        cand.join(
            sh_new.select(F.col("doc_id").alias("new_id"),
                          F.col("shingles").alias("sh_n")),
            "new_id",
        )
        .join(
            sh_base.select(F.col("doc_id").alias("base_id"),
                           F.col("shingles").alias("sh_b")),
            "base_id",
        )
        .withColumn("jaccard", jaccard(F.col("sh_n"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "base_id", "jaccard")
    )


def incremental_minhash_dups_stream(
    new_stream: DataFrame,
    base_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Continuous-ingest delta dedup: the STREAMING form of
    incremental_minhash_dups — new documents arrive as a stream and
    each micro-batch is deduped against the static base index with
    stream-static joins only.

    Two deliberate departures from the batch operator, both forced by
    Structured Streaming's execution model and both value-preserving:

    - Signatures are computed PER ROW with array HOFs
      (array_min over transform) instead of explode + groupBy-min: a
      streaming aggregation followed by a join is unsupported, and the
      per-row form needs no state at all.  Same md5 + affine-mod lane
      arithmetic, same longs, identical signatures (test-asserted).
    - A pair matching in multiple bands is emitted once per matching
      band; the candidate-pair dedup runs on the REPLAYED result table
      (candidate-sized), not in-stream — callers do
      `dropDuplicates(["new_id", "base_id"])` on the final table.

    Shape at 100 TB: the base side is the precomputed bucketed
    (band, bkey) table plus the base shingle relation; the stream
    side is today's shard, map-side work only; every join is
    stream-static (stateless), so the query runs in append mode with
    no watermark requirements."""
    assert num_hashes % bands == 0
    spark = base_df.sparkSession
    from mtail_spark.session import ensure_parallelism

    # --- static base: identical construction to the batch operator ---
    sh_base = ensure_parallelism(base_df, spark).select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    bk_base = (
        _minhash_signatures(sh_base, num_hashes)
        .select(
            "doc_id",
            F.explode(_band_struct_array(num_hashes, bands)).alias("bb"),
        )
        .select("doc_id", "bb.band", "bb.bkey")
    )

    # --- stream side: stateless per-row signatures ---
    sh_new = new_stream.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    pairs = F.transform(
        F.col("shingles"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast(
            "long"
        ),
    )
    # factory, NOT `lambda x, j=j`: PySpark inspects lambda arity and a
    # two-parameter lambda becomes the (element, index) HOF form — the
    # array index would silently shadow the hash index j
    def _sig(j: int):
        a, b = minhash_lane_consts(j)
        return F.array_min(
            F.transform(
                F.col("_mh"),
                lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_PRIME),
            )
        ).alias(f"sig{j}")

    sigged = sh_new.withColumn("_mh", pairs).select(
        "doc_id",
        "shingles",
        *[_sig(j) for j in range(num_hashes)],
    )
    new_bands = sigged.select(
        F.col("doc_id").alias("new_id"),
        F.col("shingles").alias("sh_n"),
        F.explode(_band_struct_array(num_hashes, bands)).alias("bb"),
    ).select("new_id", "sh_n", "bb.band", "bb.bkey")
    return (
        new_bands.join(bk_base, ["band", "bkey"])
        .select(
            "new_id",
            F.col("doc_id").alias("base_id"),
            "sh_n",
        )
        .join(
            sh_base.select(
                F.col("doc_id").alias("base_id"),
                F.col("shingles").alias("sh_b"),
            ),
            "base_id",
        )
        .withColumn("jaccard", jaccard(F.col("sh_n"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "base_id", "jaccard")
    )


def simhash(col: Column, n_bits: int = 32) -> Column:
    """SimHash fingerprint over whitespace tokens (array-expression
    form; see simhash_table for the explode-based scale shape).

    Each distinct token votes +1/-1 per bit of its md5_long hash; the
    fingerprint sets bit b when the vote is positive.  Near-duplicates
    differ in few bits (compare with hamming_distance64)."""
    tok_hashes = F.transform(
        F.array_distinct(words(col)), lambda t: md5_long(t)
    )
    def bit_value(b: int) -> Column:
        vote = F.aggregate(
            tok_hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        return F.when(vote > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for b in range(n_bits):
        out = out + bit_value(b)
    return out


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, n_bits: int = 32
) -> DataFrame:
    """SimHash as explode + groupBy bit-vote sums: whole-stage codegen
    with map-side combine (array lambdas evaluate interpreted per
    element).  Returns (<id_col>, simhash)."""
    from mtail_spark.session import ensure_parallelism

    df = ensure_parallelism(df, df.sparkSession)
    # explode_outer: the codegen Generate would re-split the text per
    # OUTPUT token (see minhash_lsh_pairs); outer routes to the
    # once-per-row path.  words() never yields an empty array.
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(words(F.col(text_col)))
        ).alias("t"),
    ).filter(F.col("t").isNotNull()).withColumn(
        "h", md5_long(F.col("t"))
    )
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(n_bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(n_bits):
        fp = fp + F.when(
            F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), fp.alias("simhash"))


def hamming_distance64(a: Column, b: Column) -> Column:
    """Popcount of XOR — bit_count is JVM-side in Spark 3.5+."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 32,
    n_blocks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate PAIRS via the pigeonhole block join
    (Manku et al. 2007): with n_blocks > max_hamming, any pair within
    `max_hamming` bits must agree EXACTLY on at least one fingerprint
    block, so candidates come from an equality self-join on
    (block index, block value) — never an all-pairs scan — and only
    candidates pay the popcount verification.

    Returns (id_a, id_b, hamming) with id_a < id_b and
    hamming <= max_hamming.

    At 100 TB this is the simhash analog of the MinHash band join:
    the block relation is n_blocks rows per document of
    (blk, bkey, id, fingerprint), the join key is uniform (hash
    bits), and the verify step is one integer instruction per
    candidate."""
    assert n_blocks > max_hamming, "pigeonhole needs n_blocks > max_hamming"
    block_bits = n_bits // n_blocks
    fp = simhash_table(df, id_col, text_col, n_bits)
    mask = (1 << block_bits) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftright(F.col("simhash"), b * block_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bkey"),
            )
            for b in range(n_blocks)
        ]
    )
    t = fp.select(
        F.col(id_col).alias("doc_id"),
        "simhash",
        F.explode(blocks).alias("bb"),
    ).select("doc_id", "simhash", "bb.blk", "bb.bkey")
    a, b = t.alias("a"), t.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "hamming",
            hamming_distance64(F.col("sh_a"), F.col("sh_b")).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs within a blocking key.

    Blocking keeps the self-join linear-ish at scale (never all-pairs);
    callers pick a cheap block (language, length bucket, LSH band)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("block"),
        char_ngrams(F.col(text_col), n).alias("grams"),
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            jaccard(F.col("l.grams"), F.col("r.grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _unpersist_local_checkpoint(df: DataFrame) -> None:
    """Release a superseded localCheckpoint's storage blocks.

    `df.localCheckpoint()` persists the dataset's INTERNAL RDD (the
    one inside the resulting LogicalRDD plan node); `df.rdd` would
    wrap it in an unpersisted conversion RDD, so unpersist must reach
    through the analyzed plan.  Best-effort: a plan-shape change just
    leaves the blocks to the ContextCleaner, as before."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Duplicate-GROUP resolution: label every document in the pair
    graph with the minimum doc id of its connected component
    (plus the component size) — the step that turns near-dup PAIRS
    into the keep/drop decision a production dedup actually ships.

    Iterative min-label propagation: each round, every node takes the
    min of its own label and its neighbors' labels; converges in
    O(component diameter) rounds (near-dup components are
    short-diameter in practice; max_iters bounds adversarial chains).
    Per round: one shuffle join on node id + one min-aggregate — the
    same plan at 100 TB, with labels localCheckpoint'ed so the
    iterative lineage never compounds.  Labels only ever decrease, so
    convergence == no label changed.

    Returns (doc_id, group_id, group_size) for every doc that appears
    in at least one pair.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        prop = edges.join(
            labels, edges["a"] == labels["node"]
        ).select(F.col("b").alias("node"), F.col("label"))
        new = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        _unpersist_local_checkpoint(labels)
        labels = new
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds (a component's diameter exceeds max_iters); "
            "results would be wrong — raise max_iters"
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("group_id"),
        F.col("group_size"),
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact-substring duplication stats — the span-level signal of
    "Deduplicating Training Data Makes Language Models Better" (Lee
    et al. 2022, ExactSubstr): every POSITIONAL k-token span of every
    document (multiplicity kept, unlike the distinct shingles the
    near-dup family uses), counted globally; a span occurring more
    than once anywhere in the corpus — another document OR a repeat
    inside the same one — is duplicated text.

    Returns per document: n_spans (token windows), n_dup_spans
    (windows whose text occurs >1 time corpus-wide), and
    dup_permille (integer per-mille ratio — exact in both engines,
    no float division).  Docs shorter than k tokens have 0 spans.

    At 100 TB: one explode + one count aggregation keyed on the span
    hash (map-side combine absorbs within-partition repeats), one
    shuffle join back keyed the same way, one per-doc re-aggregation.
    The reference method's suffix array is a single-machine
    construction; hashed fixed-length windows are the standard
    distributed approximation (window length = the paper's minimum
    match length).  Hot spans (the corpus's top boilerplate) skew the
    join key — AQE skew-join splits them."""
    from mtail_spark.operators.textstats import word_ngrams
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): the span regex + md5 run
    # map-side in the scan stage (sf1 measured 9.96 s → 2.17 s from
    # the free maxPartitionBytes retune; the repartition fallback is
    # skipped — both downstream aggs parallelize behind exchanges)
    docs = ensure_parallelism(docs, docs.sparkSession, tune_only=True)
    spans = docs.select(
        F.col(id_col).alias("did"),
        F.explode_outer(word_ngrams(F.col(text_col), k)).alias("s"),
    ).filter(F.col("s").isNotNull()).select(
        "did", md5_long(F.col("s")).alias("h")
    )
    counts = spans.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    agg = (
        spans.join(counts, "h")
        .groupBy("did")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("c") > 1).cast("long")).alias("n_dup"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(agg, F.col(id_col) == F.col("did"), "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.expr("(n_dup * 1000) div n_spans"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_permille"),
        )
    )
