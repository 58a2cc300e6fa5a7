"""Locality-preserving data layout: Z-order (Morton) clustering keys.

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan saving is file skipping on min/max column statistics.
Min/max skipping only works when files are CLUSTERED on the filter
columns; sorting on one column destroys locality on every other.  A
Z-order key interleaves the bits of several columns so that rows close
in ANY of the dimensions land close in the one-dimensional sort order
— writing `df.repartitionByRange("zkey").sortWithinPartitions("zkey")`
then gives every layout file a tight min/max envelope on ALL the
clustered dimensions at once (the technique behind Delta/Iceberg
`OPTIMIZE ZORDER BY`; publicly described in the Delta OPTIMIZE docs
and the Iceberg spec).

Spark-first design: the whole computation is a compile-time-unrolled
Catalyst expression tree —

  1. one tiny map-side-combinable aggregate computes each dimension's
     (min, max) envelope and broadcasts it back (a 1-row cross join);
  2. each dimension normalizes to a ``bits``-wide integer rank with
     pure integer arithmetic and TWO overflow-free branches: a narrow
     span (<= top) STRETCHES by an integer multiplier ``(v - min) *
     (top DIV span)`` so small domains (300 user ids) still fill the
     high rank bits that drive bucketing, and a wide span (epoch
     micros across decades — where the textbook multiply-first form
     overflows int64 and ANSI mode turns that into a query error)
     divides first with a ceiling divisor:
     ``(v - min) DIV ((span DIV top) + 1)``;
  3. the Morton key ORs together ``(rank_d >> i & 1) << (i*D + d)``
     for every bit i and dimension d — 2·bits·D shift/mask nodes,
     all inside WholeStageCodegen, zero Python, zero shuffle;
  4. a contiguous bucket id ``zkey * n_buckets DIV 2^(bits*D)``
     assigns rows to layout files (the repartitionByRange target).

No reference analogue: the reference engine (google/mtail) streams
logs and never lays out columnar data; this operator exists for the
100 TB training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(ranks: list[Column], bits: int) -> Column:
    """OR together the bit-spread of each rank column.

    Bit i of dimension d lands at output position ``i * D + d`` —
    the canonical Morton layout (dimension 0 owns the least
    significant bit).  Unrolled at plan-build time; evaluates as one
    codegen'd long expression per row.
    """
    ndim = len(ranks)
    out = F.lit(0).cast("long")
    for d, r in enumerate(ranks):
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * ndim + d)
            )
    return out


def rank_sql(v: str, vmin: str, vmax: str, bits: int, div: str) -> str:
    """The portable bits-wide integer-rank expression over BIGINT
    column/alias names — ONE source of truth rendered for either
    engine (``div='DIV'`` for Spark SQL, ``div='//'`` for DuckDB).

    Narrow branch (span <= top): (v-min) * (top DIV span) stretches a
    small domain across the rank space; product <= span*(top/span) <=
    top, no overflow.  Wide branch: divide-first with a CEILING
    divisor, (v-min) DIV ((span DIV top) + 1) — the multiply-first
    normalization overflows int64 for spans > 2^63/top (real for
    epoch-microsecond columns) and Spark 4 ANSI mode turns that
    overflow into a query error.  The +1 keeps the result in
    [0, top] with no clamp AND quantizes near-uniformly: the earlier
    LEAST(top, (v-min) DIV (span DIV top)) form collapsed up to half
    the domain onto the max rank whenever span sat just under a
    multiple of top (span ~ 1.9*top -> divisor 1 -> every v past
    min+top clamped), which weakened min/max skipping on that
    dimension.  Bound proof: span < (span DIV top + 1) * top by
    definition of integer division, so (v-min) DIV (divisor) <=
    span DIV divisor < top.
    """
    top = (1 << bits) - 1
    span = f"({vmax} - {vmin})"
    one = "CAST(1 AS BIGINT)"
    narrow = f"({v} - {vmin}) * ({top} {div} GREATEST({one}, {span}))"
    wide = f"({v} - {vmin}) {div} (({span} {div} {top}) + 1)"
    return f"(CASE WHEN {span} <= {top} THEN {narrow} ELSE {wide} END)"


def interleave_sql(rank_names: list[str], bits: int) -> str:
    """The same Morton interleave as ANSI SQL over pre-computed rank
    columns — shared by the DuckDB oracle so both engines evaluate
    one formula (DuckDB and Spark SQL agree on & | << >> for BIGINT)."""
    ndim = len(rank_names)
    terms = [
        f"((({r} >> {i}) & 1) << {i * ndim + d})"
        for d, r in enumerate(rank_names)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_buckets: int = 64,
    key_col: str = "zkey",
    bucket_col: str = "zbucket",
    envelope: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Append a Z-order key and a contiguous bucket id over ``cols``.

    ``cols`` must already be integral (cast timestamps to epoch
    micros first — a raw timestamp→long cast truncates differently
    across engines).  ``bits * len(cols)`` must fit a long (<= 62),
    and each column's envelope width (max - min) must itself fit a
    long — i.e. a column may not span MORE than 2^63, which only a
    contrived mixed-sign domain wider than ±2^62 violates (every
    real id/timestamp domain is single-signed or far narrower; the
    subtraction would raise an ANSI overflow error, never a wrong
    key).  The bucket id splits the z-range into ``n_buckets``
    contiguous spans — the natural ``repartitionByRange`` /
    file-split target.

    Deterministic: by default the envelope comes from the data
    itself, so the same frame always produces the same keys.  Growth
    caveat: a new increment with a wider data envelope re-ranks —
    for INCREMENTAL layout pass ``envelope={col: (min, max), ...}``
    (the production table-property pattern): keys become a pure
    function of the row, every batch ranks consistently, and the
    plan loses even the 1-row aggregate + broadcast (nothing but
    WholeStageCodegen bit math remains).  Out-of-range values clamp
    into [min, max] first — a clamped row lands in the nearest edge
    bucket (still a correct, if loose, envelope for skipping) rather
    than producing a negative or overflowing rank.
    """
    ndim = len(cols)
    if ndim < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if bits * ndim > 62:
        raise ValueError(f"bits*ndim = {bits * ndim} overflows a long")
    zspace = 1 << (bits * ndim)
    # bucket id: when n_buckets divides the key space (any power of
    # two), zkey * n DIV zspace == zkey DIV (zspace DIV n) exactly —
    # the divide form never multiplies, so a full-width key cannot
    # overflow.  The multiply form is kept only for a non-dividing
    # n_buckets and must then fit: zkey*n < 2^63.
    if zspace % n_buckets == 0:
        bucket_expr = f"{key_col} DIV {zspace // n_buckets}"
    elif bits * ndim + (n_buckets - 1).bit_length() <= 63:
        bucket_expr = f"{key_col} * {n_buckets} DIV {zspace}"
    else:
        raise ValueError(
            f"zkey * {n_buckets} overflows a long for bits*ndim = "
            f"{bits * ndim}; use a power-of-two n_buckets"
        )
    for c in cols:
        kind = dict(df.dtypes)[c]
        if kind not in ("int", "bigint", "smallint", "tinyint"):
            raise ValueError(f"zorder column {c} must be integral, got {kind}")

    if envelope is not None:
        missing = [c for c in cols if c not in envelope]
        if missing:
            raise ValueError(f"envelope missing columns: {missing}")
        for c in cols:
            mn, mx = envelope[c]
            if not (
                isinstance(mn, int) and isinstance(mx, int) and mn <= mx
            ):
                raise ValueError(f"bad envelope for {c}: {envelope[c]}")
        # pinned envelope: min/max are LITERALS, the value clamps into
        # them, and no aggregate/broadcast appears in the plan at all
        ranks = [
            F.expr(
                rank_sql(
                    f"LEAST(CAST({envelope[c][1]} AS BIGINT), "
                    f"GREATEST(CAST({envelope[c][0]} AS BIGINT), "
                    f"CAST({c} AS BIGINT)))",
                    f"CAST({envelope[c][0]} AS BIGINT)",
                    f"CAST({envelope[c][1]} AS BIGINT)",
                    bits,
                    "DIV",
                )
            )
            for c in cols
        ]
        return df.select(
            *df.columns, interleave_bits(ranks, bits).alias(key_col)
        ).withColumn(bucket_col, F.expr(bucket_expr))

    env = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("long")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("long")).alias(f"__max_{c}"),
            )
        ]
    )  # 1-row; broadcast below
    ranks = [
        F.expr(
            rank_sql(
                f"CAST({c} AS BIGINT)", f"__min_{c}", f"__max_{c}", bits, "DIV"
            )
        )
        for c in cols
    ]
    return (
        df.crossJoin(F.broadcast(env))
        .select(*df.columns, interleave_bits(ranks, bits).alias(key_col))
        .withColumn(bucket_col, F.expr(bucket_expr))
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_buckets: int = 64,
    envelope: dict[str, tuple[int, int]] | None = None,
    keep_key_cols: bool = False,
) -> None:
    """The full OPTIMIZE ZORDER BY write path: compute the keys, route
    each zbucket to exactly one output file, sort rows inside each
    file by zkey, write parquet partitioned by zbucket.

    Every file then carries a tight min/max footer envelope on ALL
    the clustered dimensions at once — tests/test_layout.py's
    end-to-end test proves the on-disk footer statistics equal the
    envelopes `zorder_skipping_stats` simulates, and that pruning on
    them loses no matching rows.

    Layout choices, spelled out:
    - hash-repartition on zbucket (not repartitionByRange): range
      boundaries are SAMPLED and can split or merge buckets, which
      loosens per-file envelopes; the hash route gives bucket<->file
      exactly 1:1 (collisions co-locate whole buckets in one task,
      and partitionBy still splits them into separate files).  The
      1:1 guarantee additionally assumes the writer's default
      ``spark.sql.files.maxRecordsPerFile = 0``: a session that sets
      a positive cap splits a large bucket into several files per
      directory.  Per-file envelopes stay correct either way (each
      file still holds one bucket's rows), just looser than one
      envelope per bucket.
    - partitionBy(zbucket) puts the bucket id in the directory name,
      so readers prune directories BEFORE opening footers.
    - sortWithinPartitions(zbucket, zkey), NOT plain zkey: the
      dynamic-partition writer requires its input ordered on the
      partition columns and inserts its own UNSTABLE sort when the
      plan's ordering doesn't already satisfy that — which destroys
      zkey order within each bucket (observed; the end-to-end test
      asserts per-file sortedness).  Leading with zbucket makes the
      plan's outputOrdering satisfy the writer's requirement, so no
      extra sort appears and per-file zkey locality survives for
      within-file page-index skipping.  (zbucket is monotone in
      zkey, so the pair sort IS the zkey sort.)
    - pass `envelope` for INCREMENTAL writes (new data appended as
      new files under the same layout): pinned envelopes keep bucket
      boundaries identical across increments.

    At 100 TB this is one shuffle of the table (the repartition) —
    the unavoidable cost of physical clustering — with no other
    exchange (pinned envelope) or one extra 1-row aggregate
    (derived envelope)."""
    z = zorder_key(
        df, cols, bits=bits, n_buckets=n_buckets, envelope=envelope
    )
    laid = z.repartition(n_buckets, F.col("zbucket")).sortWithinPartitions(
        "zbucket", "zkey"
    )
    if not keep_key_cols:
        # a projection after the sort keeps intra-partition row order
        # (no exchange); only the directory column zbucket survives
        laid = laid.drop("zkey")
    laid.write.partitionBy("zbucket").mode("overwrite").parquet(path)
