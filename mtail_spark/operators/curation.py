"""Corpus-curation operators: boilerplate n-gram detection, canonical
keep-best dedup, deterministic epoch shuffle, mixture-weighted
sampling.

These are the remaining standard stages of a large-scale training-data
pipeline (CCNet/RefinedWeb/Dolma-style) not already covered by
operators/{dedup,sampling,packing,decontam}.py.  Shared design rules:

- Every decision is a pure function of stable keys (salted md5
  buckets, document ids) — reruns, audits, and the DuckDB oracles
  reproduce results bit-for-bit.  No rand(), no nondeterministic row
  order dependence.
- 100 TB shape: the corpus moves through map-side scans plus the
  minimum shuffles (one per aggregation); anything joined back to the
  corpus is either heavy-hitter-sized (frequent boilerplate shingles)
  or aggregate-sized (per-source token totals) and is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import md5_long, word_shingles
from mtail_spark.operators.sampling import BUCKETS, sample_bucket


def frequent_shingles(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Word n-grams appearing in >= min_docs DISTINCT documents —
    the corpus's boilerplate inventory (headers, footers, license
    blurbs, navigation chrome).  One explode + one aggregation; the
    distinct-per-doc dedup happens map-side via array_distinct in
    word_shingles, so the shuffle carries (shingle, doc) pairs once
    per containing document, never per occurrence."""
    return (
        corpus.select(
            F.col(id_col),
            # explode_outer: codegen Generate re-runs the shingle
            # regex per OUTPUT row for computed arrays (dedup.simhash)
            F.explode_outer(word_shingles(F.col(text_col), n)).alias("ng"),
        )
        .filter(F.col("ng").isNotNull())
        .groupBy("ng")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_report(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Per-document boilerplate exposure: how many of the document's
    distinct n-grams are corpus-frequent, plus the per-mille ratio
    used as a drop/clean signal.  The frequent set is heavy-hitter-
    sized by construction (df >= min_docs over distinct docs), so it
    broadcasts; the corpus is scanned once and re-aggregated by id —
    the only corpus-sized shuffle."""
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): the shingle regex runs map-side
    # over every corpus scan here (sf1 measured 13.29 s → 2.90 s
    # from the free maxPartitionBytes retune)
    corpus = ensure_parallelism(corpus, corpus.sparkSession,
                                tune_only=True)
    freq = frequent_shingles(corpus, id_col, text_col, n, min_docs)
    # One exploded pass computes BOTH per-doc aggregates
    # (optimization r13, guide §1.2 minimal passes): the old shape ran
    # the shingle regex over THREE corpus scans (freq + exploded +
    # per-doc size()) and joined two per-doc relations back together.
    # explode_outer KEEPS a null placeholder row for shingle-less
    # docs, so count("ng") is exactly size(word_shingles(text)) and
    # every doc survives into the aggregate; the broadcast LEFT join
    # tags corpus-frequent shingles (null ng never equi-matches), and
    # ONE groupBy(id) yields both counts — scans 3 → 2, the
    # per-doc join gone.  Same id-uniqueness contract as
    # linear_quality_score (docs with duplicate ids would collapse).
    exploded = corpus.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("_arr")
    ).select(
        F.col(id_col),
        # size() carried per row, NOT count(ng): bit-identical to the
        # old per-doc size() column for EVERY array shape (incl. the
        # null array of a null text, where size() and a post-explode
        # count disagree)
        F.size("_arr").alias("_sz"),
        F.explode_outer("_arr").alias("ng"),
    )
    flagged = exploded.join(
        F.broadcast(freq.select("ng", F.lit(1).alias("_f"))),
        "ng",
        "left",
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.first("_sz").cast("long").alias("n_shingles"),
            F.count("_f").cast("long").alias("n_boiler"),
        )
        .select(
            F.col(id_col),
            F.col("n_shingles"),
            F.col("n_boiler"),
            # floor() (not a bare cast) so Spark's truncating
            # double->long and DuckDB's rounding double->BIGINT agree
            F.floor(
                F.col("n_boiler") * F.lit(1000) / F.col("n_shingles")
            ).cast("long").alias("boiler_permille"),
        )
    )


def keep_best(
    df: DataFrame,
    group_key,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-document selection: within each duplicate group
    (group_key — typically a normalized-content hash), keep the row
    with the highest quality, ties broken by smallest id (fully
    deterministic).  Adds `keep_id` (the group's canonical id) and
    `is_kept`.  One hash-partitioned window — no self-join, no
    driver state; group sizes are dup-group-sized, so the window
    never sees skew beyond the corpus's worst duplication factor."""
    w = Window.partitionBy(group_key).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(
            "keep_id", F.first(F.col(id_col)).over(w)
        )
        .withColumn("is_kept", (F.col("keep_id") == F.col(id_col)))
    )


def source_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    quality_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap: keep at most `cap` documents from each
    source, preferring the highest quality — the per-domain frequency
    cap of CommonCrawl-derived pipelines (a handful of domains
    otherwise dominate the corpus).  Ranks within source by
    (quality desc, id asc) — fully deterministic — and adds
    `src_rank` / `is_kept`.

    One hash-partitioned window keyed on source.  At 100 TB the skew
    IS the point (the capped sources are exactly the giant ones): a
    monster source becomes one big sort partition, so production runs
    would pre-filter with a per-source count and a quality threshold
    from approx quantiles before the exact window — the semantics
    here are the exact reference those two-phase runs must match."""
    w = Window.partitionBy(source_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return df.withColumn(
        "src_rank", F.row_number().over(w).cast("long")
    ).withColumn("is_kept", F.col("src_rank") <= cap)


def order_stat_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group corpus profile: exact p50/p90/p99 of an integer
    column as ORDER STATISTICS (the value at index ceil(p*n), type-1
    quantiles) — pure integer index arithmetic, no interpolation, so
    any engine agrees bit-for-bit (interpolated quantiles differ in
    last-ulp double ops across engines).  The calibration query behind
    length filters and packing budgets.

    Shape: one window (rank within group by value, then id for full
    determinism) sharing its shuffle with the per-group count and the
    final group-by — a single exchange on the group key.  At 100 TB
    per-group sort cost is the knob: groups here are source-sized;
    for one giant group use sampled/sketched quantiles instead (this
    is the exact-answer reference)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = (
        df.select(group_col, value_col, id_col)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    )

    def at(num: int, den: int):
        # ceil(num*n/den) as pure integer arithmetic
        idx = F.floor((F.col("n") * num + (den - 1)) / den).cast("long")
        return F.max(
            F.when(F.col("rn") == idx, F.col(value_col))
        ).cast("long")

    return ranked.groupBy(group_col).agg(
        F.max("n").cast("long").alias("n_docs"),
        at(1, 2).alias("p50"),
        at(9, 10).alias("p90"),
        at(99, 100).alias("p99"),
    )


def normalized_content_key(text_col, prefix_chars: int = 80):
    """Near-exact dedup key: md5 of the case-folded,
    whitespace-collapsed text prefix.  Catches trivially-reformatted
    copies that byte-exact hashing misses, while staying a pure
    map-side expression."""
    norm = F.regexp_replace(
        F.trim(F.lower(F.substring(text_col, 1, prefix_chars))),
        r"\s+",
        " ",
    )
    return F.md5(norm)


def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    epoch: int = 0,
    salt: str = "shuffle",
    out_col: str = "pos",
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic global training order for one epoch: every row
    gets a dense position by ascending salted hash (ties by key).
    Same corpus + same epoch => identical order on any cluster; a new
    epoch is a new salt, i.e. an independent permutation.

    A naive `row_number() OVER (ORDER BY h)` collapses to ONE
    partition in Spark (Exchange SinglePartition) — a non-starter at
    scale.  Instead: the hash's high bits define n_buckets contiguous
    hash RANGES; bucket counts (aggregate-sized) come back to the
    driver once, prefix-sum into offsets, broadcast-join back, and
    each bucket numbers itself independently (hash-partitioned
    window, zero skew because the hash is uniform).  pos =
    bucket_offset + bucket-local row_number — identical to the
    single-partition answer, computed with bucket-parallel
    exchanges."""
    h = md5_long(
        F.concat(F.lit(f"{salt}-{epoch}-"), F.col(key_col).cast("string"))
    )
    # md5_long is 60 bits; high bits => contiguous hash ranges.
    shift = max(0, 60 - max(1, n_buckets - 1).bit_length())
    with_b = df.withColumn("_h", h).withColumn(
        "_b", (F.col("_h") / F.lit(2 ** shift)).cast("long")
    )
    counts = sorted(
        (r["_b"], r["n"])
        for r in with_b.groupBy("_b").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    )
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append((b, acc))
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["_b", "_off"])
    w = Window.partitionBy("_b").orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return (
        with_b.join(F.broadcast(off_df), "_b")
        .withColumn(
            out_col,
            (F.col("_off") + F.row_number().over(w)).cast("long"),
        )
        .drop("_h", "_b", "_off")
    )


def mixture_rates(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict,
    token_budget: int,
    default_weight: float = 0.0,
) -> DataFrame:
    """Per-source ppm sampling rates that hit a token budget with a
    target mixture: source s should contribute ~weights[s] *
    token_budget tokens, so its rate is min(1, target / available).
    Returns the aggregate-sized (source, total_toks, rate_ppm) table.
    Floating point is used identically in the DuckDB oracle (same op
    order, IEEE doubles), so rates match bit-for-bit."""
    totals = df.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("total_toks")
    )
    w = F.lit(float(default_weight))
    for value, weight in sorted(weights.items()):
        w = F.when(
            F.col(source_col) == F.lit(value), F.lit(float(weight))
        ).otherwise(w)
    raw = F.floor(
        F.lit(float(BUCKETS))
        * (w * F.lit(float(token_budget)))
        / F.col("total_toks").cast("double")
    ).cast("long")
    return totals.withColumn(
        "rate_ppm", F.least(F.lit(BUCKETS).cast("long"), raw)
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict,
    token_budget: int,
    key_col: str = "doc_id",
    salt: str = "mix",
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic mixture-weighted sampling: keep each row iff its
    salted bucket falls under its source's computed rate.  The rate
    table is aggregate-sized (one row per source) and broadcast back
    onto the corpus — the corpus itself sees one scan, one
    aggregation shuffle for the totals, and a broadcast-join filter.
    Membership is reproducible row-by-row (audit any shard
    independently)."""
    rates = mixture_rates(
        df, source_col, token_col, weights, token_budget, default_weight
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(sample_bucket(F.col(key_col), salt) < F.col("rate_ppm"))
        .drop("total_toks")
    )


def global_order_stats(
    df: DataFrame,
    value_col: str,
    quantiles: dict[str, tuple[int, int]],
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT type-1 order statistics of one GLOBAL group without a
    global sort: the two-phase selection that replaces the
    single-partition ``row_number() OVER (ORDER BY v)`` plan (which
    funnels the whole input through ONE task at scale).

    ``quantiles`` maps output column name -> (num, den): the value at
    1-based rank ceil(num*n/den) in ascending ``value_col`` order —
    identical to the rank convention of order_stat_quantiles, and to
    ``min(CASE WHEN rk*den >= num*n ...)`` over a ranked frame (rank
    ties on the value cannot change the selected VALUE).

    Two-phase shape (the epoch_shuffle pattern, :209):
      1. one scan -> (n, min, max); one scan -> counts of n_buckets
         contiguous VALUE ranges (map-side partial agg; <= n_buckets
         rows come back to the driver and are prefix-summed there);
      2. the returned plan is ONE more scan filtered to the <= |q|
         target buckets, a value-level aggregate, and a window
         PARTITIONED by quantile tag over in-bucket distinct values
         (expected n/n_buckets rows; value ties collapse first).

    All arithmetic is integer (bucket = (v-min)*B DIV span), so the
    result is bit-identical to the sort-based plan on any engine.
    Constraint: (max-min+1)*n_buckets must fit in int64 — with the
    default 1024 buckets that is a value span of ~9e15 (285 years of
    microseconds), asserted below.  Like epoch_shuffle/search_topk
    this snapshots the input at BUILD time (two driver jobs); the
    returned plan must run against the same data.

    Returns ONE row: ``n`` (long; 0 on empty input) plus one long
    column per quantile (NULL on empty input)."""
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("long").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    st = vals.agg(
        F.count(F.lit(1)).alias("n"), F.min("_v").alias("mn"), F.max("_v").alias("mx")
    ).collect()[0]
    n = int(st["n"])
    out_cols = [
        F.lit(None).cast("long").alias(name) for name in quantiles
    ]
    if n == 0:
        return spark.range(1).select(
            F.lit(0).cast("long").alias("n"), *out_cols
        )
    mn, mx = int(st["mn"]), int(st["mx"])
    span = mx - mn + 1
    assert span <= (2**63 - 1) // n_buckets, (
        f"value span {span} overflows int64 bucket arithmetic at "
        f"n_buckets={n_buckets}"
    )
    bkt = F.expr(f"((_v - {mn}) * {n_buckets}) DIV {span}")
    counts = {
        int(r["_b"]): int(r["_c"])
        for r in vals.select(bkt.alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    }
    # driver-side prefix sum over <= n_buckets counts -> for each
    # quantile the (bucket, rank offset within bucket) pair
    targets = []
    for name, (num, den) in quantiles.items():
        k = (num * n + den - 1) // den  # ceil(num*n/den), 1-based
        acc = 0
        for b in sorted(counts):
            if acc + counts[b] >= k:
                targets.append((name, b, k - acc))
                break
            acc += counts[b]
    tgt = F.broadcast(
        spark.createDataFrame(targets, ["_tag", "_b", "_off"])
    )
    wv = (
        Window.partitionBy("_tag")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        vals.withColumn("_b", bkt)
        .join(tgt, "_b")  # broadcast: survivors are ~|q| * n/n_buckets rows
        .groupBy("_tag", "_off", "_v")
        .agg(F.count(F.lit(1)).alias("_vc"))
        .withColumn("_vcum", F.sum("_vc").over(wv))
        .filter(F.col("_vcum") >= F.col("_off"))
        .groupBy("_tag")
        .agg(F.min("_v").alias("_val"))
    )
    return picked.agg(
        F.lit(n).cast("long").alias("n"),
        *[
            F.min(F.when(F.col("_tag") == name, F.col("_val")))
            .cast("long")
            .alias(name)
            for name in quantiles
        ],
    )


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    bin_width: int = 64,
) -> DataFrame:
    """BOUNDED-STATE quantiles: the sketched counterpart of
    order_stat_quantiles for groups too large to sort.  Values bucket
    into fixed-width integer bins; the quantile estimate is the LOWER
    BOUND of the first bin whose cumulative count reaches the type-1
    rank ceil(p*n) — error bounded by bin_width, state bounded by
    value-range / bin_width regardless of group size.

    Everything is integer index arithmetic (the same ceil(p*n)
    ranks as the exact operator), so any engine agrees bit-for-bit.

    Shape: ONE exchange on the group key carrying BIN rows (never
    raw values); the cumulative window, the group total, and the
    final aggregate all share it.  At 100 TB this is the quantile
    plan for a single giant group — the exact operator stays the
    per-source calibration reference."""
    # FLOOR division via pmod (bare DIV truncates toward zero): for a
    # negative value, truncation would put -1 in bin 0 and report a
    # "lower bound" of 0 > -1 — the bracket guarantee below requires
    # b*bin_width <= v for every member (same fix class as
    # timeseries.window_counts)
    b = F.expr(
        f"(CAST({value_col} AS BIGINT)"
        f" - pmod(CAST({value_col} AS BIGINT), {bin_width}))"
        f" DIV {bin_width}"
    )
    bins = (
        df.select(F.col(group_col), b.alias("b"))
        .groupBy(group_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    byg = Window.partitionBy(group_col)
    cum = (
        bins.withColumn("cum", F.sum("c").over(byg.orderBy("b")))
        .withColumn("n", F.sum("c").over(byg))
    )

    def at(num: int, den: int):
        idx = F.expr(f"(n * {num} + {den - 1}) DIV {den}")
        return F.min(
            F.when(F.col("cum") >= idx, F.col("b") * bin_width)
        ).cast("long")

    return cum.groupBy(group_col).agg(
        F.max("n").cast("long").alias("n_docs"),
        at(1, 2).alias("p50_lo"),
        at(9, 10).alias("p90_lo"),
        at(99, 100).alias("p99_lo"),
    )
