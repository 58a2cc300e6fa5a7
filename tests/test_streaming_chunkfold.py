"""Serve-mode chunkfold boundary: a micro-batch whose input files
exceed CHUNKFOLD_MIN_BYTES must auto-route the register program to the
chunkfold backend inside foreachBatch, and the resulting serving-store
contents must equal the same batch folded through the non-chunkfold
route (the RAM store is merge-order-insensitive per batch, so any
backend divergence shows up as a store diff)."""

from mtail_spark.compiler import chunkfold as cfmod
from mtail_spark.compiler.api import compile_program
from mtail_spark.plans.demo_programs import TXN_PROG
from mtail_spark.streaming import run_program_stream


def _write_big_log(path, n_records: int) -> None:
    with open(path, "w") as f:
        for i in range(n_records):
            ts = (
                f"2024-01-{1 + i % 27:02d}T"
                f"{i % 24:02d}:{i // 60 % 60:02d}:{i % 60:02d}"
            )
            f.write(f"{ts} BEGIN user={i % 53}\n")
            if i % 7:
                f.write(f"{ts} AMOUNT cents={(i * 37) % 4999}\n")
            f.write(f"{ts} COMMIT\n")


def _run(spark, tmp_path, sub: str, prog):
    logs = tmp_path / sub
    logs.mkdir()
    _write_big_log(logs / "txn.log", 120_000)  # ~11 MB, > MIN_BYTES
    store, query = run_program_stream(
        prog, spark, str(logs), trigger={"availableNow": True},
        checkpoint=str(tmp_path / f"ck_{sub}"),
    )
    query.awaitTermination(300)
    return sorted(
        (
            (r["name"], tuple(sorted((r["labels"] or {}).items())),
             r.get("value_i"), r.get("value_f"), r.get("value_s"),
             r.get("ts_us"))
            for r in store.rows(include_internal=False)
        ),
    )


def test_big_batch_routes_chunkfold_and_matches(
    spark, tmp_path, monkeypatch
):
    prog = compile_program(TXN_PROG, "serve_txn.mtail")
    assert prog.checked.cross_line_state and prog.chunkfoldable

    calls = []
    orig = cfmod.chunkfold_store

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(cfmod, "chunkfold_store", spy)
    rows_cf = _run(spark, tmp_path, "cf", prog)
    assert calls, (
        "a >8 MB micro-batch should auto-route to chunkfold"
    )

    # same batch with chunkfold disabled: window-plan/fold route
    monkeypatch.setattr(cfmod, "CHUNKFOLD_MIN_BYTES", 1 << 60)
    calls.clear()
    prog2 = compile_program(TXN_PROG, "serve_txn2.mtail")
    rows_ram = _run(spark, tmp_path, "ram", prog2)
    assert not calls
    assert rows_cf == rows_ram
