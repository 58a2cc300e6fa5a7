"""Bounded-state frequency sketching: distributed count-min sketch.

An exact frequency table costs state proportional to key cardinality —
fine for a vocabulary, unaffordable for per-(user, url, window) keys
at 100 TB.  The count-min sketch aggregates into a FIXED depth x width
cell grid regardless of cardinality: the aggregation state is
constant-sized, the merge is cellwise addition (associative, so Spark
map-side combine collapses every partition to <= depth*width cells
before the one exchange), and a key's estimate (min over its depth
cells) over-counts only by collision mass, never under-counts
(Cormode & Muthukrishnan 2005).

The hash family is md5-lane derived (row i hashes "cms{i}-" + key),
the same portable construction as dedup.md5_long, so the DuckDB
oracle reproduces every cell and every estimate bit-for-bit — sketch
"approximation" means a bounded-error ESTIMATE, not nondeterminism.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import words

DEPTH = 4
WIDTH = 1024


def _bucket_col(col, i: int, width: int):
    """Row-i bucket of a string column: md5 of a row-salted key, first
    15 hex chars as a 60-bit int, mod width (all JVM codegen)."""
    h = F.md5(F.concat(F.lit(f"cms{i}-"), col))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width
    )


def bucket_py(term: str, i: int, width: int) -> int:
    """Driver-side mirror of _bucket_col for query-term lookups (same
    md5, same lanes — consistent by construction)."""
    h = hashlib.md5(f"cms{i}-{term}".encode()).hexdigest()
    return int(h[:15], 16) % width


def _cms_cells(
    keys: DataFrame,
    group_cols: list,
    key_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Shared cell builder for the global and grouped sketches — one
    source for the lane construction, like the HLL kernels.

    explode_outer on purpose: codegen Generate would re-evaluate the
    computed md5-struct array once per OUTPUT row (depth x the digest
    work); outer routes to the row-at-a-time generator that builds it
    once per input row (repo-wide convention, see dedup)."""
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): the md5-lane fold runs map-side
    # in the scan stage; a multi-row-group input gets a free parallel
    # scan (cms_counts sf1 measured 8.96 s → 1.48 s), a single-group
    # file keeps its plan (streaming inputs pass through untouched)
    keys = ensure_parallelism(keys, keys.sparkSession, tune_only=True)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _bucket_col(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        keys.select(
            *[F.col(g) for g in group_cols], F.explode_outer(cells).alias("cell")
        )
        .select(*group_cols, "cell.row", "cell.bucket")
        .groupBy(*group_cols, "row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_build(
    keys: DataFrame,
    key_col: str = "term",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Sketch a key stream (one row per occurrence) into (row, bucket,
    c) cells — at most depth*width rows no matter the cardinality."""
    return _cms_cells(keys, [], key_col, depth, width)


def cms_build_by(
    keys: DataFrame,
    group_col: str,
    key_col: str = "term",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Per-group CMS cells: one depth x width grid PER GROUP VALUE
    (the "term frequencies per language/source at 100 TB" shape —
    an exact per-group count table shuffles every distinct
    (group, key) pair; this shuffles at most depth*width rows per
    group)."""
    return _cms_cells(keys, [group_col], key_col, depth, width)


def cms_estimate(
    sketch: DataFrame,
    terms: list,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-query the sketch for a list of keys: est = min over the
    key's depth cells (absent cell = 0).  The lookup set is
    query-sized and broadcast; the sketch itself is depth*width-
    bounded, so nothing here scales with the corpus."""
    spark = sketch.sparkSession
    lookups = spark.createDataFrame(
        [
            (t, i, bucket_py(t, i, width))
            for t in terms
            for i in range(depth)
        ],
        ["term", "row", "bucket"],
    )
    # the SKETCH broadcasts (<= depth*width rows by construction);
    # the preserved lookup side of the left join cannot
    return (
        lookups.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


def cms_estimate_by(
    sketch: DataFrame,
    group_col: str,
    terms: list,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Per-group point queries over a cms_build_by table: the lookup
    rows fan out across the sketch's distinct groups (group
    cardinality x terms x depth), left-join the per-group cells, and
    take the per-(group, term) min with absent cells = 0.

    Size bound: the grouped sketch is (groups x depth x width) cells
    — BOUNDED PER GROUP, not globally.  For the shape this operator
    targets (language/source/day groups: tens to thousands of
    values) the whole sketch fits a broadcast; for a high-cardinality
    group column (user-level grouping) it does not, so the sketch
    side carries NO forced F.broadcast — the planner (with AQE) picks
    broadcast when the measured size allows and falls back to a
    shuffle join keyed on (group, row, bucket) otherwise.  The
    lookup fan-out (groups x terms x depth rows on the PRESERVED side
    of the left join) is a tiny local relation the planner broadcasts
    on its own; no hint is forced (broadcasting the preserved side of
    a left join isn't a valid hint anyway)."""
    spark = sketch.sparkSession
    lookups = spark.createDataFrame(
        [
            (t, i, bucket_py(t, i, width))
            for t in terms
            for i in range(depth)
        ],
        ["term", "row", "bucket"],
    )
    groups = sketch.select(group_col).distinct()
    return (
        lookups.crossJoin(groups)
        .join(sketch, [group_col, "row", "bucket"], "left")
        .groupBy(group_col, "term")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


HLL_BUCKETS = 256  # 2^8 registers; standard error ~1.04/sqrt(m) ~ 6.5%

# rho (leading-zero rank) is capped so 2^(HLL_CAP - rho) is an exact
# integer and the register sum of <= m such terms stays far below
# 2^63 — the harmonic mean's sum is then EXACT integer arithmetic,
# immune to float-add reordering across partitions.
HLL_CAP = 40


def _hll_registers(
    keys: DataFrame, group_cols: list, key_col: str, m: int
) -> DataFrame:
    """Shared register builder: bucket = one md5 lane mod m, rho =
    position of the first 1-bit (from the MSB) of a second,
    independent 48-bit lane, capped at HLL_CAP; register = max(rho)
    per (groups, bucket) (Flajolet et al. 2007).  max() is
    associative, so the aggregation state is m integers per group
    with full map-side combine.

    rho comes from an exact integer comparison tree, NOT
    floor(log2(w)): log2 is a transcendental with no cross-engine
    rounding guarantee and can misplace exact powers of two; the
    comparisons make every step integer-deterministic and
    bit-reproducible by the SQL oracle.  ONE source for the global
    and grouped forms — the lane layout cannot silently diverge."""
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): same map-side md5-lane hazard as
    # _cms_cells (hll_distinct sf1 measured 4.05 s → 1.20 s)
    keys = ensure_parallelism(keys, keys.sparkSession, tune_only=True)
    h = F.md5(F.concat(F.lit("hll-"), F.col(key_col)))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    w = F.conv(F.substring(h, 9, 12), 16, 10).cast("long")
    # rho = 49 - bit_length(w) for w > 0, capped: anything below
    # 2^(48 - HLL_CAP + 1) — including w = 0 — lands on the cap
    rho = F.lit(HLL_CAP)
    for r in range(HLL_CAP - 1, 0, -1):  # r = rho value
        rho = F.when(w >= (1 << (48 - r)), F.lit(r)).otherwise(rho)
    return (
        keys.select(
            *[F.col(g) for g in group_cols],
            bucket.alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("long").alias("reg"))
    )


def _hll_estimate(regs: DataFrame, group_cols: list, m: int) -> DataFrame:
    """Shared estimate layer: EXACT integer arithmetic until one
    final double division — each register contributes 2^(HLL_CAP -
    reg) (an exact integer, shift not pow(): libm pow has no
    exactness guarantee even at integer exponents), absent buckets
    contribute 2^HLL_CAP, the sum is a plain BIGINT (order-
    independent, unlike a float harmonic sum), and est =
    round(alpha_m * m^2 * 2^HLL_CAP / S) with the numerator folded
    into ONE Python-computed double literal.  The small-range
    linear-counting correction is deliberately omitted — it needs
    ln(), which is not bit-portable; the raw estimate is the
    demonstrated kernel."""
    alpha = 0.7213 / (1 + 1.079 / m)
    k = float(alpha * m * m * (1 << HLL_CAP))
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"{HLL_CAP} - CAST(reg AS INT))"
            )
        ).alias("s_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_regs")) * F.lit(1 << HLL_CAP)
    ).cast("long")
    return agg.select(
        *[F.col(g) for g in group_cols],
        F.col("n_regs").cast("long").alias("n_regs"),
        s_total.alias("sum_scaled"),
        F.round(F.lit(k) / s_total.cast("double"))
        .cast("long")
        .alias("est_distinct"),
    )


def hll_registers(
    keys: DataFrame,
    key_col: str = "term",
    m: int = HLL_BUCKETS,
) -> DataFrame:
    """HyperLogLog registers for a key stream — the distinct-count
    analog of the count-min grid (see _hll_registers for the lane
    construction)."""
    return _hll_registers(keys, [], key_col, m)


def hll_registers_by(
    keys: DataFrame,
    group_col: str | list,
    key_col: str = "term",
    m: int = HLL_BUCKETS,
) -> DataFrame:
    """Per-group HLL registers: state is m integers PER GROUP VALUE
    regardless of per-group key cardinality (the "distinct users per
    day/type/source at 100 TB" shape: exact count_distinct shuffles
    every distinct pair; this shuffles at most m rows per group).
    ``group_col`` may be one column name or a list (e.g.
    [window_start, event_type] for the windowed form)."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    return _hll_registers(keys, groups, key_col, m)


def hll_estimate_by(
    regs: DataFrame, group_col: str | list, m: int = HLL_BUCKETS
) -> DataFrame:
    """Per-group raw HLL estimate over a hll_registers_by table."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    return _hll_estimate(regs, groups, m)


def hll_estimate(regs: DataFrame, m: int = HLL_BUCKETS) -> DataFrame:
    """Raw HLL harmonic-mean estimate from the register table (see
    _hll_estimate for the exact-integer arithmetic)."""
    return _hll_estimate(regs, [], m)


def cms_token_counts(
    corpus: DataFrame,
    terms: list,
    text_col: str = "text",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """End-to-end: tokenize the corpus, sketch token occurrences,
    estimate the given terms' frequencies.  One corpus scan, one
    bounded exchange, a broadcast lookup."""
    toks = (
        corpus.select(
            F.explode_outer(words(F.lower(F.col(text_col)))).alias("term")
        )
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
    )
    return cms_estimate(
        cms_build(toks, "term", depth, width), terms, depth, width
    )


def cms_inner_product(
    sa: DataFrame, sb: DataFrame, depth: int = DEPTH
) -> DataFrame:
    """JOIN-SIZE ESTIMATION by sketch inner product — the second
    classic count-min application (Cormode & Muthukrishnan 2005,
    §4.2): for two key streams A and B sketched with the SAME lanes,
    dot_r = sum_b cellA[r][b] * cellB[r][b] equals |A join B| plus
    nonnegative collision mass, so est = min over rows r of dot_r
    never under-estimates the equi-join cardinality.  This is the
    planner primitive: size a prospective join (or a self-join /
    skew statistic, B = A) from two depth*width cell tables WITHOUT
    executing it — at 100 TB the sketches are kilobytes where the
    join is a corpus shuffle.

    A hash row whose cells never collide across the two sketches has
    dot_r = 0; an inner-join-only min would silently skip such rows
    and over-estimate, so the row domain is materialized and absent
    dots count as 0.  Everything here is sketch-sized.

    Overflow: per-cell counts scale ~rows/width, so at ~1e12 input
    rows ca*cb is ~1e18 and the width-cell row sum ~1e21 — past
    int64, which ANSI mode turns into a query error.  The dot
    products therefore accumulate in DECIMAL(38,0) (the computation
    is sketch-sized, so the wide type costs nothing) and only the
    final min is cast back to long; that cast is safe because the
    min-over-rows estimate upper-bounds the true join size plus
    collision mass of one row, which a real join could never reach
    past int64 anyway without the join itself being impossible."""
    spark = sa.sparkSession
    rows = spark.range(depth).select(F.col("id").cast("int").alias("row"))
    wide = "decimal(38,0)"
    dots = (
        sa.select("row", "bucket", F.col("c").alias("ca"))
        .join(
            sb.select("row", "bucket", F.col("c").alias("cb")),
            ["row", "bucket"],
        )
        .groupBy("row")
        .agg(
            F.sum(
                F.col("ca").cast(wide) * F.col("cb").cast(wide)
            ).alias("dot")
        )
    )
    return rows.join(dots, "row", "left").agg(
        F.min(F.coalesce(F.col("dot"), F.lit(0).cast(wide)))
        .cast("long")
        .alias("est_join_size")
    )


# --------------------------------------------------------------- quantiles
#
# Mergeable RANK sketch — the third leg of the sketch triad next to
# frequency (CMS, add-merge) and cardinality (HLL, max-merge).  KLL
# (Karnin/Lang/Liberty 2016) is the textbook choice, but its
# compactors discard odd/even survivors by a COIN FLIP, and any
# deterministic derivation of that coin makes the result depend on
# merge order — which would break both this repo's bit-equality
# oracle gate and the stream ≡ batch proof (state-store merges see
# arbitrary micro-batch boundaries).  So the rank sketch here is the
# HDR-histogram / DDSketch family instead: values land in log2
# octaves split into 2^HDR_SUB_BITS linear sub-buckets, counts
# add-merge exactly like count-min cells (associative + commutative
# -> merge-order-proof by construction), and the quantile estimate
# is a deterministic type-1 selection over the bucket table with the
# bucket's LOWER BOUND as the representative value.  Relative error
# <= 2^-HDR_SUB_BITS (~3%); state <= ~(64 - HDR_SUB_BITS) * 2^
# HDR_SUB_BITS + 2^(HDR_SUB_BITS+1) buckets (~1950 for full-range
# int64) per group, at ANY value cardinality.
#
# Everything is integer bit math — bucket index from the bin()
# bit-length (both engines print BIGINTs unpadded) plus shifts, so
# the DuckDB oracle reproduces every bucket and every estimate
# bit-for-bit; no transcendental log appears anywhere (the DDSketch
# paper's log_gamma bucketing is NOT bit-portable at bucket
# boundaries).

HDR_SUB_BITS = 5  # 32 linear sub-buckets per octave


def hdr_bucket_sql(v: str, sub_bits: int = HDR_SUB_BITS) -> str:
    """Portable SQL bucket index over a BIGINT expression — ONE
    source of truth rendered for both engines (Spark SQL and DuckDB
    agree on BIN/LENGTH/GREATEST and << >> for BIGINT; no integer-
    division token needed, so the string is literally shared).

    idx = shift * 2^s + (v >> shift),  shift = max(bitlen(v)-1-s, 0)

    Values < 2^(s+1) map EXACTLY (idx = v); above that, each power-
    of-two octave splits into 2^s linear sub-buckets.  The index is
    monotone in v and contiguous across the exact/log boundary.
    Negative inputs clamp to 0 (the sketch domain is nonnegative;
    bin() of a negative renders 64 two's-complement chars and the
    engines' >> differ on sign extension, so the clamp is part of
    the portable formula, not a convenience).  NULLs also land on
    bucket 0: both engines' GREATEST skips nulls (verified on Spark
    4 and DuckDB 1.0), so GREATEST(NULL, 0) = 0 — still, prefer an
    explicit coalesce upstream so the intent is visible (the
    registered queries do)."""
    s = sub_bits
    nn = f"GREATEST(CAST({v} AS BIGINT), CAST(0 AS BIGINT))"
    shift = f"GREATEST(LENGTH(BIN({nn})) - {1 + s}, 0)"
    return f"(({shift}) * {1 << s} + (({nn}) >> ({shift})))"


def hdr_value_sql(idx: str, sub_bits: int = HDR_SUB_BITS) -> str:
    """Bucket lower bound (the deterministic representative value):
    k = max((idx >> s) - 1, 0); lo = (idx - k * 2^s) << k."""
    s = sub_bits
    k = f"GREATEST((({idx}) >> {s}) - 1, 0)"
    return f"((({idx}) - ({k}) * {1 << s}) << ({k}))"


def hdr_bucket_py(v: int, sub_bits: int = HDR_SUB_BITS) -> int:
    """Driver-side mirror of hdr_bucket_sql (unit-test pin)."""
    v = max(int(v), 0)
    shift = max(v.bit_length() - 1 - sub_bits, 0)
    return shift * (1 << sub_bits) + (v >> shift)


def hdr_value_py(idx: int, sub_bits: int = HDR_SUB_BITS) -> int:
    """Driver-side mirror of hdr_value_sql (unit-test pin)."""
    k = max((idx >> sub_bits) - 1, 0)
    return (idx - k * (1 << sub_bits)) << k


def hdr_cells(
    values: DataFrame,
    group_cols: list | None = None,
    value_col: str = "v",
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Sketch a nonnegative BIGINT value stream into (groups..., idx,
    c) bucket counts — the bounded, ADD-MERGEABLE state.  Map-side
    combine collapses every partition to <= bucket-count rows before
    the one exchange, exactly like the count-min cells; the same
    groupBy runs unchanged as a Structured Streaming stateful
    aggregation (sums commute across micro-batches), which is how the
    streaming dual reuses this builder verbatim."""
    group_cols = group_cols or []
    idx = F.expr(hdr_bucket_sql(value_col, sub_bits))
    return (
        values.select(*group_cols, idx.cast("long").alias("idx"))
        .groupBy(*group_cols, "idx")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def hdr_quantiles(
    cells: DataFrame,
    quantiles: list,
    group_cols: list | None = None,
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Deterministic type-1 quantile estimates over a (merged) cell
    table: for each percentile q, rank = ceil(n*q/100) and the
    estimate is the lower bound of the first bucket whose cumulative
    count reaches it — all BIGINT arithmetic.

    Plan shape: everything downstream of `cells` is bucket-count-
    bounded (<= groups x ~1950 rows).  The per-group total is a
    whole-partition window sum over the SAME partitioning as the
    cumulative sum — one partitioned pass, no self-join (a
    cells-with-aggregate-of-cells join also trips Spark's
    conflicting-attribute resolution when `cells` is a streaming
    memory-sink view, which the streaming dual feeds in).  The
    window partitions by (groups..., q) — the quantile TAG keeps the
    partition spec non-empty even in the global case (the
    conversion_lag_quantiles pattern), so no Exchange
    SinglePartition appears at any scale."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    spark = cells.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in quantiles], "q long")
    j = cells.crossJoin(F.broadcast(qdf))
    w_cum = Window.partitionBy(*group_cols, "q").orderBy("idx")
    w_all = Window.partitionBy(*group_cols, "q")
    hit = (
        j.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n_rows", F.sum("c").over(w_all).cast("long"))
        .filter(F.col("cum") >= F.expr("(n_rows * q + 99) DIV 100"))
        .groupBy(*group_cols, "q", "n_rows")
        .agg(F.min("idx").alias("idx"))
    )
    return hit.select(
        *group_cols,
        "q",
        F.expr(hdr_value_sql("idx", sub_bits)).cast("long").alias("est_value"),
        "n_rows",
    )


BLOOM_BITS = 4096
BLOOM_K = 3


def _bit_col(col, i: int, m: int):
    """Lane-i Bloom bit of a string column: md5 of a lane-salted key,
    first 15 hex chars as a 60-bit int, mod m (all JVM codegen — the
    same portable construction as the count-min buckets)."""
    h = F.md5(F.concat(F.lit(f"bloom{i}-"), col))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom filter as a set-bit table: one row per SET position,
    at most m rows no matter how many keys go in (distinct is the
    bitwise-OR merge, associative with map-side combine).  At 100 TB
    the m-bounded table packs into a long[m/64] broadcast bitmap and
    the probe below becomes a map-side array lookup; the DataFrame
    form keeps the build/merge/probe algebra visible and oracle-
    checkable.  False positives are a deterministic function of the
    md5 lanes — the oracle reproduces every one.

    explode_outer on purpose (repo-wide convention, see cms_build):
    codegen Generate would re-evaluate the k-digest array once per
    OUTPUT row."""
    bits = F.array(*[_bit_col(F.col(key_col), i, m) for i in range(k)])
    return (
        keys.select(F.explode_outer(bits).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits_table: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership probe: a key is a MAYBE-member iff all k of its bit
    positions are set (no false negatives; false positives at the
    standard (1-e^(-kn/m))^k rate).  The set-bit table broadcasts
    (<= m rows by construction); the probe side is scanned once and
    never shuffled on a skewable key — the group-back is on the
    probe's own columns, k-bounded per key."""
    out_cols = probes.columns
    pos = F.array(*[_bit_col(F.col(key_col), i, m) for i in range(k)])
    exploded = probes.select(*out_cols, F.explode_outer(pos).alias("bit"))
    marked = bits_table.withColumn("_set", F.lit(1))
    # matched == total (not == k): robust when a probe key appears in
    # duplicate rows — the group then holds a multiple of k positions
    # and a fixed `== k` would flag true members as misses
    return (
        exploded.join(F.broadcast(marked), "bit", "left")
        .groupBy(*out_cols)
        .agg(
            (F.count(F.col("_set")) == F.count(F.lit(1))).alias("bloom_hit")
        )
    )
