"""Log-line sources.

The engine's universal input relation is

    log_lines(filename STRING, line_no BIGINT, line STRING)

mirroring the reference's LogLine record (reference
internal/logline/logline.go:9-14) plus an explicit ordering column:
the reference gets per-file order implicitly from sequential reads;
a distributed engine must carry it as data.

Framing follows reference internal/tailer/logstream/reader.go:68-106:
split on \\n, strip one trailing \\r, keep an unterminated final line.
Spark's text source implements exactly this framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# wholetext materializes each file as ONE row, so a file bigger than
# this routes to the splittable path automatically — a 100 GB log
# would otherwise OOM a single executor before any fold saw it
WHOLETEXT_MAX_BYTES = 256 << 20


def _local_paths(path) -> list[str]:
    import glob as _glob
    import os

    if isinstance(path, (list, tuple)):
        return [p for p in path if os.path.isfile(p)]
    if os.path.isdir(path):
        return [
            os.path.join(path, f)
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        ]
    return [p for p in _glob.glob(path) if os.path.isfile(p)]


def _any_huge_file(path: str, threshold: int) -> bool:
    import os

    for p in _local_paths(path):
        try:
            if os.path.getsize(p) > threshold:
                return True
        except OSError:
            pass
    return False


def read_log_lines(
    spark: SparkSession, path: str, exact_order: bool | None = None
) -> DataFrame:
    """Batch-read text logs as the log_lines relation.

    exact_order=True reads whole files and explodes lines with their
    positions — exact per-file line numbers, parallel across files;
    right for order-sensitive programs on normal-sized log files.

    exact_order=False streams through splittable text partitions and
    derives the ordering key from monotonically_increasing_id(), which
    increases with (input split, row offset) — per-file order holds
    because the text source lists a file's splits in offset order.
    Right for huge append-only logs where order only matters locally.

    exact_order=None (the default) picks automatically: wholetext
    unless any matched local file exceeds WHOLETEXT_MAX_BYTES, so a
    huge log can never OOM an executor by materializing as one row.
    Both paths yield identical per-file ORDER (all order-sensitive
    semantics key on it); only the line_no VALUES differ (0-based vs
    monotonic id), which nothing downstream depends on.
    """
    if exact_order is None:
        exact_order = not _any_huge_file(path, WHOLETEXT_MAX_BYTES)
    if exact_order:
        df = spark.read.text(path, wholetext=True).withColumn(
            "filename", F.input_file_name()
        )
        # Framing: split on \n; drop the empty tail produced by a
        # trailing newline, keep a non-empty unterminated final line.
        lines = F.split(F.col("value"), "\n")
        lines = F.when(
            F.element_at(lines, -1) == "", F.slice(lines, 1, F.size(lines) - 1)
        ).otherwise(lines)
        df = df.select(
            "filename", F.posexplode(lines).alias("line_no", "line")
        ).withColumn("line", F.regexp_replace("line", "\r$", ""))
        return df.select("filename", "line_no", "line")
    df = (
        spark.read.text(path)
        .withColumn("filename", F.input_file_name())
        .withColumn("line_no", F.monotonically_increasing_id())
        .withColumn("line", F.regexp_replace("value", "\r$", ""))
    )
    return df.select("filename", "line_no", "line")


def log_lines_from_df(
    df: DataFrame, line_col: str, filename: str = "df", order_col: str | None = None
) -> DataFrame:
    """Adapt any DataFrame with a text column into the log_lines
    relation (used to run mtail programs over e.g. the events table)."""
    if order_col is None:
        ordered = df.withColumn("line_no", F.monotonically_increasing_id())
    else:
        ordered = df.withColumn("line_no", F.col(order_col).cast("long"))
    return ordered.select(
        F.lit(filename).alias("filename"),
        F.col("line_no"),
        F.col(line_col).cast("string").alias("line"),
    )
