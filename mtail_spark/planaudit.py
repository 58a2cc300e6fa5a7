"""Shared plan-audit helpers: the single source of truth for the
streaming-replay registry and the global-window detector, used by
BOTH tests/test_plan_invariants.py (the CI gate) and
tools/scale_audit.py (the SCALE.md table) so the two can never
disagree about which queries replay eagerly or what counts as an
un-partitioned window."""

from __future__ import annotations

import re

# Queries whose construction RUNS a streaming replay (the returned
# DataFrame is the final memory-sink table — nothing left to check);
# each maps to the batch dual whose plan carries the same operator
# shape.
STREAMING_REPLAY: dict[str, str] = {
    "session_window_stream": "sessionize_events",
    "rate_anomalies_stream": "rate_anomalies",
    "dedup_exact_stream": "dedup_exact",
    "tumbling_window_stream": "tumbling_window_counts",
    "dedup_incremental_stream": "dedup_incremental",
    "band_join_stream": "band_join_counts",
    "asof_join_stream": "asof_join_last_touch",
    "sliding_window_stream": "sliding_window_stats",
    # the mergeable-sketch pairs (r9 VERDICT item 4): their returned
    # plan is only the estimate layer over the replayed state table,
    # so the stateful-aggregation shape itself is audited via the
    # batch dual that builds the same cells/registers from the same
    # source
    "hll_distinct_stream": "hll_distinct_by_type",
    "cms_counts_stream": "cms_counts",
    "quantile_sketch_stream": "quantile_sketch_by_type",
    "hll_distinct_windowed_stream": "hll_distinct_windowed",
}


def _first_top_level_arg(args: str) -> str:
    """First comma-separated argument at paren depth 0 — a plain
    .split(',') would truncate a computed ordering expression like
    coalesce(a, b) ASC and mask its sort keyword."""
    depth = 0
    for i, ch in enumerate(args):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            return args[:i]
    return args


def empty_partition_windows(opt_plan: str) -> list[str]:
    """windowspecdefinition(part..., order..., frame): partition
    columns carry no sort direction, order columns do — so a FIRST
    top-level argument with ASC/DESC means the partition spec is
    empty (an Exchange SinglePartition at scale)."""
    hits = []
    for m in re.finditer(
        r"windowspecdefinition\((.*?)specifiedwindowframe", opt_plan
    ):
        first = _first_top_level_arg(m.group(1))
        if " ASC" in first or " DESC" in first:
            hits.append(m.group(1)[:80])
    return hits
