"""Streaming pipeline tests: compiled program over a file stream with
availableNow trigger, plus the serving store's TTL / limit GC."""

import time

from mtail_spark.compiler.api import compile_program
from mtail_spark.streaming import StreamingMetricStore, run_program_stream

PROG = """
counter lines_total
counter by_word by word

/(?P<word>\\w+)/ {
  lines_total++
  by_word[$word]++
}
"""

TTL_PROG = """
gauge session_start by session
counter ends by session limit 2

/start (?P<s>\\w+)/ {
  session_start[$s] = 1
  del session_start[$s] after 1h
}
/end (?P<s>\\w+)/ {
  ends[$s]++
}
"""


def test_stream_counts(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text("foo\nbar\nfoo\n")
    prog = compile_program(PROG, "stream.mtail")
    store, query = run_program_stream(
        prog, spark, str(logs), trigger={"availableNow": True},
        checkpoint=str(tmp_path / "ck"),
    )
    query.awaitTermination(120)
    rows = {r["name"]: r for r in store.rows() if not r["labels"]}
    assert rows["lines_total"]["value_i"] == 3
    words = {
        tuple(r["labels"].items()): r["value_i"]
        for r in store.rows()
        if r["labels"]
    }
    assert words[(("word", "foo"),)] == 2
    assert words[(("word", "bar"),)] == 2 - 1


def test_stream_incremental_merge(spark, tmp_path):
    logs = tmp_path / "logs2"
    logs.mkdir()
    (logs / "a.log").write_text("x\n")
    prog = compile_program(PROG, "stream2.mtail")
    store, query = run_program_stream(
        prog, spark, str(logs), trigger={"availableNow": True},
        checkpoint=str(tmp_path / "ck2"),
    )
    query.awaitTermination(120)
    # second batch: new file discovered, counters must ADD
    (logs / "b.log").write_text("x\ny\n")
    store2, query2 = run_program_stream(
        prog, spark, str(logs), store=store,
        trigger={"availableNow": True}, checkpoint=str(tmp_path / "ck2"),
    )
    query2.awaitTermination(120)
    rows = {r["name"]: r for r in store2.rows() if not r["labels"]}
    assert rows["lines_total"]["value_i"] == 3


def test_store_gc_ttl_and_limit():
    prog = compile_program(TTL_PROG, "ttl.mtail")
    store = StreamingMetricStore(prog)
    now = int(time.time() * 1_000_000)
    hour = 3600 * 1_000_000

    def datum(name, labels, ts):
        return {
            "prog": "ttl.mtail", "name": name, "kind": "gauge" if
            name == "session_start" else "counter", "vtype": "Int",
            "labels": labels, "value_i": 1, "value_f": None,
            "value_s": None, "buckets": None, "bucket_count": None,
            "bucket_sum": None, "ts_us": ts,
        }

    store.merge_batch([
        datum("session_start", {"session": "old"}, now - 2 * hour),
        datum("session_start", {"session": "new"}, now),
        datum("ends", {"session": "a"}, now - 3),
        datum("ends", {"session": "b"}, now - 2),
        datum("ends", {"session": "c"}, now - 1),
    ])
    removed = store.gc(now_us=now)
    # TTL: 'old' expired (1h TTL); limit: ends capped at 2, oldest out
    assert removed == 2
    keys = {(k[0], dict(k[1]).get("session")) for k in store.data}
    assert ("session_start", "old") not in keys
    assert ("session_start", "new") in keys
    assert ("ends", "a") not in keys
    assert ("ends", "b") in keys and ("ends", "c") in keys


def test_exactly_once_restart_recovery(spark, tmp_path):
    """Kill/restart with checkpoint + store snapshot: the resumed
    store must equal the one-shot run (no double counting)."""
    logs = tmp_path / "logs_eo"
    logs.mkdir()
    ck = str(tmp_path / "ck_eo")
    snap = str(tmp_path / "store_eo.json")
    prog = compile_program(PROG, "eo.mtail")

    (logs / "a.log").write_text("foo\nbar\nfoo\n")
    store1, q1 = run_program_stream(
        prog, spark, str(logs), trigger={"availableNow": True},
        checkpoint=ck, store_path=snap,
    )
    q1.awaitTermination(120)

    # process "restart": new store object, same checkpoint + snapshot
    (logs / "b.log").write_text("foo\nbaz\n")
    store2, q2 = run_program_stream(
        prog, spark, str(logs), trigger={"availableNow": True},
        checkpoint=ck, store_path=snap,
    )
    q2.awaitTermination(120)

    got = {
        tuple((r["labels"] or {}).items()): r["value_i"]
        for r in store2.rows()
        if r["name"] == "by_word"
    }
    assert got[(("word", "foo"),)] == 3
    assert got[(("word", "bar"),)] == 1
    assert got[(("word", "baz"),)] == 1
    rows = {r["name"]: r for r in store2.rows() if not r["labels"]}
    assert rows["lines_total"]["value_i"] == 5


def test_merge_batch_replay_dedupe():
    prog = compile_program(PROG, "dedupe.mtail")
    store = StreamingMetricStore(prog)
    row = {
        "prog": "dedupe.mtail", "name": "lines_total", "kind": "counter",
        "vtype": "Int", "labels": None, "value_i": 7, "value_f": None,
        "value_s": None, "buckets": None, "bucket_count": None,
        "bucket_sum": None, "ts_us": None,
    }
    store.merge_batch([row], batch_id=0)
    store.merge_batch([row], batch_id=0)  # checkpoint replay
    store.merge_batch([row], batch_id=1)
    vals = {r["name"]: r["value_i"] for r in store.rows(False)}
    assert vals["lines_total"] == 14


def test_store_limit_bounds_million_cardinality():
    """The serving store is driver-RAM like the reference's (store.go);
    `limit N` is what bounds it under high-cardinality label spaces.
    Stream 1M distinct label tuples through merge_batch in micro-batch
    sized slices with gc() after each commit (the daemon's cadence,
    streaming/reload.py) and check the store never exceeds
    limit + one batch of growth, ending at exactly the cap."""
    prog = compile_program(
        "counter hits by id limit 1000\n/(?P<id>\\w+)/ { hits[$id]++ }\n",
        "cardinality.mtail",
    )
    store = StreamingMetricStore(prog)
    total, batch = 1_000_000, 100_000
    t0 = time.monotonic()
    for b in range(total // batch):
        rows = [
            {
                "prog": "cardinality.mtail", "name": "hits",
                "kind": "counter", "vtype": "Int",
                "labels": {"id": f"k{b * batch + i}"},
                "value_i": 1, "value_f": None, "value_s": None,
                "buckets": None, "bucket_count": None,
                "bucket_sum": None, "ts_us": b * batch + i,
            }
            for i in range(batch)
        ]
        store.merge_batch(rows, batch_id=b)
        store.gc(now_us=0)
        assert len(store.data) <= 1000 + batch
    dt = time.monotonic() - t0
    n = len([k for k in store.data if k[0] == "hits"])
    assert n == 1000
    # newest keys survive (eviction is oldest-ts first)
    assert ("hits", (("id", f"k{total - 1}"),)) in store.data
    assert ("hits", (("id", "k0"),)) not in store.data
    # sanity: 1M tuples must stream through in interactive time
    assert dt < 60, f"1M-cardinality merge+gc took {dt:.1f}s"
