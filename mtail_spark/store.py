"""The metric store: the engine's output data model.

Reference semantics (see reference internal/metrics/store.go:19-23,
internal/metrics/metric.go:84-97): a store maps metric name -> metrics;
each metric has a kind (counter|gauge|timer|text|histogram), a value
type (Int|Float|String|Buckets), label dimension names (Keys), and one
datum (value, timestamp) per distinct label-value tuple.

Spark mapping: the store is a DataFrame with one row per datum.  A
compiled mtail program produces this DataFrame from a log_lines input;
in streaming mode foreachBatch upserts into an in-memory serving copy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import types as T

# One row per datum.  `labels` is a map from dimension name to string
# value (mtail coerces all label values to string at write time,
# reference internal/runtime/compiler/codegen/codegen.go:272-284).
STORE_SCHEMA = T.StructType(
    [
        T.StructField("prog", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("vtype", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("value_i", T.LongType(), True),
        T.StructField("value_f", T.DoubleType(), True),
        T.StructField("value_s", T.StringType(), True),
        T.StructField(
            "buckets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("le", T.DoubleType(), False),
                        T.StructField("count", T.LongType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("bucket_count", T.LongType(), True),
        T.StructField("bucket_sum", T.DoubleType(), True),
        # Datum timestamp in epoch MICROSECONDS (int64).  Go's time
        # model reaches year 0 (yearless syslog defaults, reference
        # vm.go:309-332 with the current-year patch off), which neither
        # Python datetime nor Spark TimestampType can represent.
        T.StructField("ts_us", T.LongType(), True),
    ]
)

EPOCH = 0  # epoch microseconds

KINDS = ("counter", "gauge", "timer", "text", "histogram")
VTYPES = ("Int", "Float", "String", "Buckets")


@dataclass(frozen=True)
class DatumRow:
    """A materialized store row, used for golden comparison."""

    prog: str
    name: str
    kind: str
    vtype: str
    labels: tuple  # tuple of (k, v) pairs, sorted by key
    value: object  # int | float | str | tuple of (le, count) pairs
    ts: int | None  # epoch microseconds

    def sort_key(self):
        return (self.prog, self.name, self.labels)


@dataclass
class StoreDiff:
    missing: list = field(default_factory=list)
    unexpected: list = field(default_factory=list)
    mismatched: list = field(default_factory=list)  # (expected, actual)

    @property
    def ok(self) -> bool:
        return not (self.missing or self.unexpected or self.mismatched)

    def render(self) -> str:
        out = []
        for d in self.missing:
            out.append(f"MISSING    {d}")
        for d in self.unexpected:
            out.append(f"UNEXPECTED {d}")
        for e, a in self.mismatched:
            out.append(f"EXPECTED   {e}\nACTUAL     {a}")
        return "\n".join(out)


def _value_eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def diff_stores(
    expected: list[DatumRow],
    actual: list[DatumRow],
    check_timestamps: bool = True,
) -> StoreDiff:
    """Set-comparison of two stores, mirroring the reference's golden
    test rule (sorted, order-insensitive;
    reference internal/mtail/examples_integration_test.go:117-123)."""
    diff = StoreDiff()
    amap = {(d.prog, d.name, d.labels): d for d in actual}
    emap = {(d.prog, d.name, d.labels): d for d in expected}
    for k, e in emap.items():
        a = amap.get(k)
        if a is None:
            diff.missing.append(e)
        elif not _value_eq(e.value, a.value) or (
            check_timestamps and e.ts is not None and a.ts != e.ts
        ):
            diff.mismatched.append((e, a))
    for k, a in amap.items():
        if k not in emap:
            diff.unexpected.append(a)
    return diff


def rows_from_df(df) -> list[DatumRow]:
    """Collect a store DataFrame into DatumRows (small results only —
    the store is the *output* of an aggregation, cardinality = number
    of label tuples, not number of input lines)."""
    out = []
    for r in df.collect():
        labels = tuple(sorted((r["labels"] or {}).items()))
        if r["vtype"] == "Int":
            value = r["value_i"]
        elif r["vtype"] == "Float":
            value = r["value_f"]
        elif r["vtype"] == "String":
            value = r["value_s"]
        else:
            value = (
                tuple((b["le"], b["count"]) for b in (r["buckets"] or [])),
                r["bucket_count"],
                r["bucket_sum"],
            )
        ts = r["ts_us"]
        out.append(
            DatumRow(r["prog"], r["name"], r["kind"], r["vtype"], labels, value, ts)
        )
    return out
