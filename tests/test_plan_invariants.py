"""Scale-invariant plan guards over EVERY registered query.

PLANS.md records plan evidence for humans; these tests enforce the two
invariants that must hold for any query to survive a 100x scale-up,
so a regression (a join losing its broadcast hint and becoming a
cartesian, an expression falling off the Arrow path into row-at-a-time
Python) fails CI instead of waiting for a bench to notice:

1. No CartesianProduct node, ever.  Intentional tiny cross joins
   (the 1-row count relation, the k-row query set) must be broadcast
   (BroadcastNestedLoopJoin) — an unhinted cartesian would shuffle
   corpus x corpus at scale.
2. No row-at-a-time Python (BatchEvalPython / PythonUDF-over-rows).
   Every Python surface must be Arrow-batched: ArrowEvalPython,
   MapInPandas, FlatMapGroupsInPandas.

Streaming-replay queries execute eagerly and return memory-sink
tables (their plan is the already-computed local relation), so the
invariants are checked on their batch duals instead.
"""

import io
import contextlib

import pytest

import __spark_entry__ as entrymod

# queries whose construction RUNS a streaming replay (the returned
# DataFrame is the final memory-sink table — nothing left to check)
STREAMING_REPLAY = {
    "session_window_stream",
    "rate_anomalies_stream",
    "dedup_exact_stream",
    "tumbling_window_stream",
    "dedup_incremental_stream",
    "band_join_stream",
    "asof_join_stream",
    "sliding_window_stream",
}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def all_plans(spark, sf_smoke):
    plans = {}
    for name, fn in entrymod.queries().items():
        if name in STREAMING_REPLAY:
            continue
        plans[name] = _plan(fn(spark, sf_smoke))
    return plans


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, (
        f"unbroadcast cartesian joins (corpus x corpus shuffles at "
        f"scale): {offenders}"
    )


def test_no_row_at_a_time_python(all_plans):
    offenders = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert not offenders, (
        f"row-at-a-time Python UDFs (10-100x slower than Arrow): "
        f"{offenders}"
    )


def test_python_surfaces_are_arrow_batched(all_plans):
    # sanity check on the checker itself: the Arrow paths we rely on
    # are actually present where expected
    assert "ArrowEvalPython" in all_plans["sim_topk_pq"]
    assert "MapInPandas" in all_plans["multimodal_frames"]
    assert "FlatMapGroupsInPandas" in all_plans["pack_sequences"]
