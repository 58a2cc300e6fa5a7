"""Chunk-parallel speculative fold ("chunkfold") backend.

Register-RMW programs (cross-line scalar hidden-metric state, e.g.
reference examples/mysql_slowqueries.mtail) are order-sensitive, so
the plain fold runs each FILE through one sequential task — a 100 GB
file folds on one core.  The vectorized window plan
(codegen.py:_plan_registers) parallelizes them but pays a large
per-line expression constant (stratified carry windows; ~460
core-us/line on mysql_slowqueries vs the fold interpreter's ~26).
This backend combines fold constants with chunk parallelism:

phase A — parallel, mapInPandas over (filename, chunk): run the
  normal per-line interpreter SPECULATIVELY with tri-state scalar
  registers.  A register written earlier in the chunk is Known; a
  read of a chunk-incoming (Unknown) register raises NeedState, which
  aborts the line — its partial effects are rolled back through an
  undo journal — records the raw line for replay together with a
  snapshot of the currently-Known registers, and marks every register
  Unknown again (taint: the deferred line may write any of them).  A
  line that completes without NeedState only read chunk-local state,
  so its metric effects are valid unconditionally; registers written
  by later non-deferred lines win over any deferred line's potential
  writes exactly as they would have in a sequential fold.  In
  log-shaped data registers re-resolve within a handful of lines
  (mysql: the next "# User@Host" / "SET timestamp=" record header),
  so deferral is O(record length) per chunk, not O(chunk).

phase B — executor-side, grouped by file: each chunk's summary
  (final Known register values + the deferred raw lines, NEVER the
  chunk's data) is replayed strictly in chunk order through the same
  interpreter — one applyInPandas group per file, parallel across
  files — inside the merge job: before each deferred line its
  snapshot overlays the running register state (values written by
  non-deferred lines between two deferred lines), the line executes
  with full knowledge, and after a chunk's deferred lines the chunk's
  finals overwrite the state for the next chunk.  This yields the
  deferred lines' metric effects under the true incoming state.  The
  driver sees only slim audit tuples (file, chunk, max_line,
  disorder) — O(chunks) small rows; snapshots and raw deferred lines
  never leave the executors.

merge — chunk partial stores collapse per file (counters/histograms
  additively with the datum timestamp taken at the last (chunk, line)
  update; gauge/timer/text pick the last (chunk, line) write), then
  across files through exactly the ordered fold's merge semantics
  (api.merge_parsed_partials), so chunkfold output is identical to
  the sequential fold by construction wherever both are defined.

Scope (chunkfold_unsupported_reason): all metric READS and `del`s
must target HIDDEN metrics (registers) — scalar or dimensioned
(per-key session state, the rsyncd/vsftpd pattern: Known-ness is
tracked per register ENTRY, and an unfired threatened site of a
dimensioned register taints the whole register since its key
expression is unevaluated).  Exported metrics accept additive
updates (++/--/+= on counters, = on histograms) and last-write
assignments (= on gauge/timer/text) in statement position.  Anything
else — exported-metric reads, non-additive exported RMW, hidden
histograms — is outside the class and keeps its existing route
(vectorized window plan or the sequential fold).

Reference semantics mirrored: per-line execution order
internal/runtime/vm/vm.go:962-989; runtime-error-kills-line-only
vm.go:97-129; `stop` vm.go:353-354.

Scaling: phase A parallelism is total_lines / CHUNK_LINES (or one
task per scan split in zero-exchange mode) over a raw three-column
exchange at most.  The only sequential work is phase B's per-FILE
replay, bounded by deferred-prefix length x the file's chunk count —
store-sized per chunk, never line-sized — running executor-side and
parallel across files.  Driver traffic is O(chunks) slim audit
tuples with no payloads: 100 TB at 128 MB splits is ~800k four-field
rows (~tens of MB), and sizing splits toward 1 GB cuts it another
8x.  Register-state snapshots scale with the chunk's LIVE
register-entry cardinality (per-key session state), not with chunk
length.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mtail_spark.compiler import ast as A
from mtail_spark.compiler.checker import CheckedProgram
from mtail_spark.compiler.interp import Interp, LineError, Runtime, StopLine, Store

# Lines per chunk: parallelism within one file scales as
# lines/CHUNK_LINES; phase B's control traffic scales as
# files*chunks*(registers + deferred prefix).  32768 lines (~3 MB of
# text) keeps both ends comfortable from 1 MB to 100 GB files.
CHUNK_LINES = 32768

# Auto-routing floor: below this input size the vectorized window
# plan / plain fold win on fixed overheads (chunkfold pays two extra
# jobs + a driver replay round trip, ~2-3 s); above it the window
# plan's ~16x higher per-line constant dominates (measured
# tools/bench_mysql_backends.py: 4.1 s vs 34.6 s at 37 MB).
CHUNKFOLD_MIN_BYTES = 8 << 20


class NeedState(Exception):
    """Phase-A read of a register whose chunk-incoming value is
    unknown: the line rolls back and defers to the driver replay."""


# --------------------------------------------------------------- gate


def chunkfold_unsupported_reason(prog: CheckedProgram) -> str | None:
    """None when the program is in the chunkfold class, else why not.

    The class: cross-chunk state must live ONLY in registers (hidden
    metrics, scalar or dimensioned, reconstructible per chunk by the
    replay — hidden histograms excepted, their value is a bucket
    list), and every exported-metric update must be chunk-mergeable
    (additive for counter/histogram, last-write for gauge/timer/text)
    with its value unconsumed."""
    metrics = prog.metrics

    def target_info(e):
        name = e.lhs.name
        mi = metrics.get(name)
        if mi is None:
            return name, None
        return name, mi

    err: list[str] = []

    def fail(msg):
        if not err:
            err.append(msg)

    for name, mi in metrics.items():
        # a hidden histogram's value is a bucket-count list — not
        # representable in the chunk state snapshots (and reading one
        # is not meaningful DSL anyway)
        if mi.decl.hidden and mi.decl.kind == "histogram":
            fail(f"hidden histogram {name}")

    def walk_expr(e, stmt_root=False):
        if isinstance(e, A.IndexedExpr):
            # read position: must be a register (scalar or dimensioned)
            name, mi = target_info(e)
            if mi is None or not mi.decl.hidden:
                fail(f"reads exported metric {name}")
            for ix in e.index:
                walk_expr(ix)
        elif isinstance(e, A.BinaryExpr):
            if e.op in ("=", "+="):
                t = e.lhs
                if isinstance(t, A.IndexedExpr):
                    name, mi = target_info(t)
                    if mi is not None and not mi.decl.hidden:
                        kind = mi.decl.kind
                        if not stmt_root:
                            fail(f"consumes exported write {name}")
                        if e.op == "+=" and kind not in (
                            "counter", "histogram"
                        ):
                            fail(f"+= on exported {kind} {name}")
                        if e.op == "=" and kind == "counter":
                            fail(f"= on exported counter {name}")
                    for ix in t.index:
                        walk_expr(ix)
                else:
                    walk_expr(t)
                walk_expr(e.rhs)
            else:
                walk_expr(e.lhs)
                walk_expr(e.rhs)
        elif isinstance(e, A.UnaryExpr):
            if e.op in ("++", "--") and isinstance(e.expr, A.IndexedExpr):
                name, mi = target_info(e.expr)
                if mi is not None and not mi.decl.hidden:
                    if not stmt_root:
                        fail(f"consumes exported RMW {name}")
                    if mi.decl.kind not in ("counter", "histogram"):
                        fail(f"++ on exported {mi.decl.kind} {name}")
                for ix in e.expr.index:
                    walk_expr(ix)
            else:
                walk_expr(e.expr)
        elif isinstance(e, A.BuiltinCall):
            for a in e.args:
                walk_expr(a)

    def walk_stmt(s):
        if isinstance(s, A.StmtList):
            for x in s.stmts:
                walk_stmt(x)
        elif isinstance(s, A.CondStmt):
            if not isinstance(s.cond, A.OtherwiseCond):
                walk_expr(s.cond)
            if s.truth:
                walk_stmt(s.truth)
            if s.els:
                walk_stmt(s.els)
        elif isinstance(s, A.ExprStmt):
            walk_expr(s.expr, stmt_root=True)
        elif isinstance(s, A.DelStmt):
            name = s.target.lhs.name
            mi = metrics.get(name)
            if mi is None or not mi.decl.hidden:
                fail(f"del of exported metric {name}")
            for ix in s.target.index:
                walk_expr(ix)

    walk_stmt(prog.stmts)
    return err[0] if err else None


# ------------------------------------------------------------- stores


def _snap_datum(d):
    if d is None:
        return None
    if isinstance(d[0], list):  # histogram: [counts, count, sum, ts]
        return [list(d[0])] + d[1:]
    return list(d)


class TrackingStore(Store):
    """Store + per-datum last-update (chunk, line) tags + an undo
    journal.  Base for the phase-A speculative store and the phase-B
    replay store (where the tags order replayed writes against chunk
    partials in the merge)."""

    def __init__(self, prog: CheckedProgram):
        super().__init__(prog)
        self.last_upd: dict[tuple, tuple] = {}
        self.journal: list = []
        self.cur_chunk = 0
        self.cur_line = -1
        self._hidden = {
            n for n, mi in prog.metrics.items() if mi.decl.hidden
        }

    def _pre_write(self, name, labels):
        self.journal.append((
            name, labels,
            _snap_datum(self.data[name].get(labels)),
            self.last_upd.get((name, labels)),
        ))

    def _tag(self, name, labels):
        self.last_upd[(name, labels)] = (self.cur_chunk, self.cur_line)

    def inc(self, name, labels, delta, ts_us):
        self._pre_write(name, labels)
        super().inc(name, labels, delta, ts_us)
        self._tag(name, labels)

    def set(self, name, labels, value, ts_us):
        self._pre_write(name, labels)
        super().set(name, labels, value, ts_us)
        self._tag(name, labels)

    def observe(self, name, labels, v, ts_us):
        self._pre_write(name, labels)
        super().observe(name, labels, v, ts_us)
        self._tag(name, labels)

    def delete(self, name, labels):
        self._pre_write(name, labels)
        super().delete(name, labels)

    def begin_line(self, line_no: int):
        self.cur_line = line_no
        self.journal.clear()

    def rollback_line(self):
        for name, labels, prev, prev_upd in reversed(self.journal):
            if prev is None:
                self.data[name].pop(labels, None)
            else:
                self.data[name][labels] = prev
            if prev_upd is None:
                self.last_upd.pop((name, labels), None)
            else:
                self.last_upd[(name, labels)] = prev_upd
        self.journal.clear()


class SpecStore(TrackingStore):
    """Phase-A tri-state store: a register ENTRY (scalar: labels=();
    dimensioned: one per label tuple) is Known only after a write (or
    del: deleted reads back as the typed zero, a DEFINED value)
    within the chunk; reading an Unknown one raises NeedState.
    Exported metrics never gate (the class check bars reading them),
    and their chunk-local values are deltas/last writes merged
    later."""

    def __init__(self, prog: CheckedProgram):
        super().__init__(prog)
        # register name -> set of Known label tuples this chunk
        self.known: dict[str, set] = {}
        self._known_line: list[tuple] = []  # Known-adds of this line
        # scalar-only programs can retire speculation entirely once
        # every register is Known (see _AllKnownStore)
        self._scalar_only = all(
            not prog.metrics[n].decl.keys for n in self._hidden
        )
        # storage type per non-histogram metric for the fast-mode
        # set() hot path (exact-type check, no coercion)
        _pytypes = {"Int": int, "Float": float, "String": str}
        self._vt = {
            n: _pytypes[mi.vtype]
            for n, mi in prog.metrics.items()
            if mi.decl.kind != "histogram" and mi.vtype in _pytypes
        }

    def _gate(self, name, labels):
        if name in self._hidden and labels not in self.known.get(
            name, ()
        ):
            raise NeedState(name)

    def _learn(self, name, labels):
        if name in self._hidden:
            s = self.known.setdefault(name, set())
            if labels not in s:
                s.add(labels)
                self._known_line.append((name, labels))
                if self._scalar_only and len(self.known) == len(
                    self._hidden
                ):
                    # every register Known -> NeedState is impossible
                    # for the rest of the chunk; retire the
                    # speculation tax (mid-line swap is safe: the
                    # only rollback trigger is NeedState)
                    self.journal.clear()
                    self.__class__ = _AllKnownStore

    def get(self, name, labels):
        self._gate(name, labels)
        return super().get(name, labels)

    def inc(self, name, labels, delta, ts_us):
        self._gate(name, labels)  # RMW reads the previous value
        super().inc(name, labels, delta, ts_us)

    def set(self, name, labels, value, ts_us):
        super().set(name, labels, value, ts_us)
        self._learn(name, labels)

    def delete(self, name, labels):
        super().delete(name, labels)
        self._learn(name, labels)

    def begin_line(self, line_no: int):
        super().begin_line(line_no)
        self._known_line.clear()

    def rollback_line(self):
        super().rollback_line()
        for name, labels in self._known_line:
            self.known.get(name, set()).discard(labels)
        self._known_line.clear()

    def snapshot(self) -> dict:
        """Known register entry values at the current point (recorded
        with a deferred line so the replay sees exactly this state)."""
        return {
            (name, labels): Store.get(self, name, labels)
            for name, entries in self.known.items()
            for labels in entries
        }


class _AllKnownStore(SpecStore):
    """Post-speculation fast mode for SCALAR-only register programs:
    once every register is Known, `_gate` can never trip (a scalar
    register has exactly one entry, and `del` keeps it Known — a
    deleted entry reads back as the typed zero, a DEFINED value), so
    NeedState — the ONLY rollback trigger — is impossible for the
    rest of the chunk.  SpecStore._learn swaps the instance's
    __class__ here the moment the last register becomes Known, which
    retires the per-op speculation tax (gate checks, the undo
    journal + datum snapshots, Known bookkeeping) with zero per-call
    flag tests.  Data layout, merge tags, and `known` are untouched,
    so chunk output is bit-identical to the slow path (asserted
    across backends in test_chunkfold.py / test_fuzz_consistency.py).
    Profiled on mysql_slowqueries phase A: the speculation tax was
    ~40% of single-thread line time."""

    def get(self, name, labels):
        d = self.data[name].get(labels)
        if d is not None:
            return d[0]
        return Store.get(self, name, labels)

    def inc(self, name, labels, delta, ts_us):
        d = self.data[name].get(labels)
        if d is not None and type(d[0]) in (int, float):
            d[0] += delta
            d[1] = ts_us
        else:
            Store.inc(self, name, labels, delta, ts_us)
        self.last_upd[(name, labels)] = (self.cur_chunk, self.cur_line)

    def set(self, name, labels, value, ts_us):
        # hot path: value already the storage type (srcgen emits
        # typed values for statically-known expressions); histograms
        # have no _vt entry and fall through to Store.set -> observe
        if type(value) is self._vt.get(name):
            d = self.data[name].get(labels)
            if d is None:
                d = self._datum(name, labels)
            d[0] = value
            d[1] = ts_us
        else:
            Store.set(self, name, labels, value, ts_us)
        self.last_upd[(name, labels)] = (self.cur_chunk, self.cur_line)

    def observe(self, name, labels, v, ts_us):
        Store.observe(self, name, labels, v, ts_us)
        self.last_upd[(name, labels)] = (self.cur_chunk, self.cur_line)

    def delete(self, name, labels):
        Store.delete(self, name, labels)

    def begin_line(self, line_no: int):
        self.cur_line = line_no


# --------------------------------------------------- state serialization


def _dump_state(state: dict) -> str:
    """{(name, labels): value} -> JSON (typed; labels as a list)."""
    out = []
    for (n, labels), v in state.items():
        if isinstance(v, bool):
            rec = [n, list(labels), "i", int(v)]
        elif isinstance(v, int):
            rec = [n, list(labels), "i", v]
        elif isinstance(v, float):
            rec = [n, list(labels), "f", v]
        else:
            rec = [n, list(labels), "s", str(v)]
        out.append(rec)
    out.sort(key=lambda r: (r[0], r[1]))
    return json.dumps(out)


def _load_state(s: str) -> dict:
    out = {}
    for n, labels, t, v in json.loads(s):
        out[(n, tuple(labels))] = (
            int(v) if t == "i" else float(v) if t == "f" else str(v)
        )
    return out


def _apply_state(st: Store, state: dict) -> None:
    for (name, labels), v in state.items():
        st._datum(name, labels)[0] = v


# -------------------------------------------------------------- export

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType(), False),
        T.StructField("chunk", T.LongType(), False),
        T.StructField("row_type", T.IntegerType(), False),  # 0=partial
        T.StructField("name", T.StringType(), True),        # 1=finals
        T.StructField("kind", T.StringType(), True),        # 2=deferred
        T.StructField("vtype", T.StringType(), True),
        T.StructField("labels_json", T.StringType(), True),
        T.StructField("value_i", T.LongType(), True),
        T.StructField("value_f", T.DoubleType(), True),
        T.StructField("value_s", T.StringType(), True),
        T.StructField("buckets_json", T.StringType(), True),
        T.StructField("bucket_count", T.LongType(), True),
        T.StructField("bucket_sum", T.DoubleType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("last_line", T.LongType(), True),
        T.StructField("payload_json", T.StringType(), True),
    ]
)

_COLS = [f.name for f in CHUNK_SCHEMA.fields]


def _blank_row(src_file, chunk, row_type):
    r = dict.fromkeys(_COLS)
    r["src_file"], r["chunk"], r["row_type"] = src_file, chunk, row_type
    return r


def _partials_with_tags(st: TrackingStore, src_file: str) -> list[dict]:
    """Exported datums of one speculative/replay store as tagged
    partial rows (mirrors Store.export_rows + api._rows_to_partial,
    plus the (chunk, last_line) merge ordering; zero-init scalar
    counter/histogram rows carry tag (-1, -1) so any real update
    outranks them)."""
    prog = st.prog
    rows: list[dict] = []
    for name, mi in prog.metrics.items():
        if mi.decl.hidden:
            continue
        export_name = mi.decl.exported_name or name
        kind, keys, vt = mi.decl.kind, mi.decl.keys, mi.vtype
        datums = dict(st.data[name])
        if not keys and () not in datums:
            if kind == "counter":
                datums[()] = [0.0 if vt == "Float" else 0, 0]
            elif kind == "histogram":
                n = len(st.bucket_maxes[name])
                datums[()] = [[0] * n, 0, 0.0, None]
        for labels, d in datums.items():
            ch, ln = st.last_upd.get((name, labels), (-1, -1))
            r = _blank_row(src_file, ch, 0)
            r["name"] = export_name
            r["kind"] = kind
            r["labels_json"] = json.dumps(
                dict(zip(keys, labels)), sort_keys=True
            )
            r["last_line"] = ln
            if kind == "histogram":
                r["vtype"] = "Buckets"
                r["buckets_json"] = json.dumps(
                    [
                        {
                            "le": ("Infinity" if le == float("inf") else le),
                            "count": c,
                        }
                        for le, c in zip(st.bucket_maxes[name], d[0])
                    ]
                )
                r["bucket_count"] = d[1]
                r["bucket_sum"] = d[2]
                r["ts_us"] = d[3]
            else:
                r["vtype"] = vt
                if vt == "Int":
                    r["value_i"] = int(d[0])
                elif vt == "Float":
                    r["value_f"] = float(d[0])
                else:
                    r["value_s"] = str(d[0])
                r["ts_us"] = d[1]
            rows.append(r)
    return rows


# ------------------------------------------------------------- phase A


def _salvage(it: Interp, rt, st: SpecStore, line: str):
    """Speculative salvage on NeedState.

    The pre-abort prefix of an aborted line is EXACT execution (it
    never read unknown state, or it would have aborted earlier), so
    register writes that fired in it are the truth — unless a site
    that has NOT fired yet could still write the same register after
    the abort point.  A site can only fire on a line its dominating
    pattern conditions match (Interp.reg_sites), giving a cheap sound
    threat test: dominating regex already evaluated false on this
    line -> can't fire; unevaluated -> test the raw line (or assume
    fire for subject'd patterns).  Returns (written-values, threat
    set).  Without this refinement every deferral forgets all
    registers and chunk-start deferral cascades through the whole
    chunk (mysql: settime(time) and the user=="" stop guard touch
    every line, so knowledge could never accumulate)."""
    fired_sids = {sid for sid, _labels in rt.fired}
    written = {}
    for sid, labels in rt.fired:
        g, _doms = it.reg_sites[sid]
        written[(g, labels)] = Store.get(st, g, labels)
    # threat is REGISTER-level: an unfired dimensioned site's key
    # expression is unevaluated, so any entry of that register could
    # be the one it writes
    threat: set = set()
    for sid, (g, doms) in enumerate(it.reg_sites):
        if sid in fired_sids or g in threat:
            continue
        could_fire = True
        for rid in doms:
            m = rt.matches.get(rid, Ellipsis)
            if m is not Ellipsis:
                if m is None:  # condition already evaluated false
                    could_fire = False
                    break
                continue
            if it.subjects[rid] is not None:
                continue  # matches a register-derived subject: assume
            if it.res[rid].search(line) is None:
                could_fire = False
                break
        if could_fire:
            threat.add(g)
    return written, threat


def _mk_runtime(it: Interp, store: Store, now_us: int, filename: str):
    syslog_year = None
    if it.syslog_use_current_year:
        from mtail_spark.compiler.gotime import epoch_us_year

        syslog_year = epoch_us_year(now_us)
    rt = Runtime(store, now_us, syslog_year=syslog_year)
    rt.filename = filename
    return rt


def _worker_prog(src: str, name: str, use_year: bool, tz):
    """Worker-process-level compile cache: Spark reuses Python workers
    across partitions and stages, so a 64-split scan would otherwise
    re-parse + re-close-compile the program 64 times (tens of ms each
    against a ~25 us/line fold).  The cache must live on the IMPORTED
    module (persistent in the worker process), not a closure's pickled
    globals (fresh per task)."""
    from mtail_spark.compiler.checker import check as _check

    import mtail_spark.compiler.chunkfold as _cfmod

    cache = getattr(_cfmod, "_WORKER_PROGS", None)
    if cache is None:
        cache = _cfmod._WORKER_PROGS = {}
    ck = (hash(src), name, use_year, tz)
    hit = cache.get(ck)
    if hit is None:
        prog = _check(src, name)
        hit = (prog, Interp(prog, use_year, tz=tz))
        if len(cache) > 8:
            cache.clear()
        cache[ck] = hit
    return hit


def _phase_a_fn(src: str, name: str, use_year: bool, tz, now_us: int):
    """mapInPandas closure: speculative fold per (filename, chunk)."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        prog, it = _worker_prog(src, name, use_year, tz)
        # (filename, chunk) -> [rt, SpecStore, deferred, max_line,
        # disorder]; max_line/disorder feed the driver's contiguity
        # audit of zero-exchange chunks (finals row value_i/value_f)
        states: dict = {}
        for pdf in batches:
            if "__chunk" in pdf.columns:
                groups = pdf.groupby(["filename", "__chunk"], sort=False)
            else:
                # zero-exchange mode: this partition is one contiguous
                # split per file; the chunk id is the split's first
                # line_no (file-wide monotonic), so chunk ids order
                # identically to line order.
                groups = (
                    ((fname, None), sub)
                    for fname, sub in pdf.groupby("filename", sort=False)
                )
            for (fname, ch), sub in groups:
                key = (fname, ch)
                lnos = sub["line_no"].to_numpy()
                if not len(lnos):
                    continue
                stt = states.get(key)
                if stt is None:
                    st = SpecStore(prog)
                    st.cur_chunk = int(
                        ch if ch is not None else lnos[0]
                    )
                    rt = _mk_runtime(it, st, now_us, fname)
                    stt = states[key] = [rt, st, [], -1, False]
                rt, st, deferred = stt[0], stt[1], stt[2]
                if lnos[0] <= stt[3] or (
                    len(lnos) > 1 and (np.diff(lnos) <= 0).any()
                ):
                    stt[4] = True
                stt[3] = max(stt[3], int(lnos[-1]))
                program = it.program
                for line_no, line in zip(
                    lnos.tolist(), sub["line"].tolist()
                ):
                    rt.line_no = line_no
                    rt.line = line
                    rt.matches = {}
                    rt.ts_us = None
                    rt.fired.clear()
                    st.begin_line(line_no)
                    try:
                        program(rt)
                    except NeedState:
                        written, threat = _salvage(it, rt, st, line)
                        st.rollback_line()
                        deferred.append(
                            (line_no, line, _dump_state(st.snapshot()))
                        )
                        for g in threat:
                            st.known.pop(g, None)
                        for (g, labels), v in written.items():
                            if g not in threat:
                                st._datum(g, labels)[0] = v
                                st.known.setdefault(g, set()).add(
                                    labels
                                )
                    except (StopLine, LineError):
                        pass
        out: list[dict] = []
        for (fname, _ch), (rt, st, deferred, max_line, disorder) in (
            states.items()
        ):
            ch = st.cur_chunk
            out.extend(_partials_with_tags(st, fname))
            fin = _blank_row(fname, ch, 1)
            fin["payload_json"] = _dump_state(st.snapshot())
            fin["last_line"] = 1 << 62  # sorts after the chunk's deferred
            fin["value_i"] = max_line
            fin["value_f"] = 1.0 if disorder else 0.0
            out.append(fin)
            for line_no, line, snap in deferred:
                dr = _blank_row(fname, ch, 2)
                dr["last_line"] = int(line_no)
                dr["value_s"] = line
                dr["payload_json"] = snap
                out.append(dr)
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    return fn


# ------------------------------------------------------------- phase B


def _replay_file(
    prog: CheckedProgram, it: Interp, fname: str, rows, now_us: int
) -> list[dict]:
    """Sequential replay of ONE file's deferred lines under true
    incoming state.  `rows` are that file's control rows — finals
    (row_type 1) + deferred (row_type 2) — as attribute-access records
    in any order.  Output: tagged partial rows for the deferred
    lines' metric effects (one row per touched datum)."""
    rows = sorted(rows, key=lambda r: (r.chunk, r.last_line or 0))
    st = TrackingStore(prog)
    rt = _mk_runtime(it, st, now_us, fname)
    touched = False
    for r in rows:
        if r.row_type == 2:
            _apply_state(st, _load_state(r.payload_json))
            st.cur_chunk, st.cur_line = r.chunk, r.last_line
            rt.line_no = r.last_line
            rt.line = r.value_s
            rt.matches = {}
            rt.ts_us = None
            rt.fired.clear()
            st.journal.clear()
            touched = True
            try:
                it.program(rt)
            except (StopLine, LineError):
                pass
        else:  # finals: true end-of-chunk state for the next chunk
            _apply_state(st, _load_state(r.payload_json))
    if not touched:
        return []
    # zero-init rows already came from every phase-A chunk; emit only
    # datums the replay actually updated
    return [
        row
        for row in _partials_with_tags(st, fname)
        if row["last_line"] != -1
    ]


def _replay_fn(src: str, name: str, use_year: bool, tz, now_us: int):
    """applyInPandas closure: phase B replay, one group per src_file.
    Each file's replay is inherently sequential (it IS the fold of the
    deferred lines), but files replay in parallel and — the point at
    scale — register snapshots and deferred raw lines stay on the
    executors; the driver never sees phase-B payloads at all."""

    def fn(pdf):
        import pandas as pd

        prog, it = _worker_prog(src, name, use_year, tz)
        fname = pdf["src_file"].iat[0] if len(pdf) else ""
        out = _replay_file(
            prog, it, fname, list(pdf.itertuples(index=False)), now_us
        )
        return pd.DataFrame(out, columns=_COLS)

    return fn


# --------------------------------------------------------------- merge


def _merge_chunk_partials(
    partials: DataFrame, prog_name: str, kinds=None
) -> DataFrame:
    """Collapse per-(file, chunk) partials to per-file partials —
    counters/histograms additively, gauge/timer/text by last
    (chunk, line) write, datum ts at the last update — then merge
    across files with exactly the fold's semantics.  kinds (the
    program's exported kinds) prunes branches for absent kinds at
    both levels."""
    from mtail_spark.compiler.api import (
        _BUCKETS_TYPE,
        merge_parsed_partials,
    )

    def want(*ks):
        return kinds is None or any(k in kinds for k in ks)

    # Within one file, (chunk, last_line) ordering collapses to
    # last_line ALONE: chunk ids are the chunk's first line_no (or
    # floor(line_no/CHUNK) in exchange mode), so last_line is
    # file-wide monotonic in both modes and zero-init rows carry -1.
    # A single BIGINT ordering keeps every stage-1 max_by PRIMITIVE
    # (HashAggregate, never SortAggregate over the chunk partials).
    p = partials
    ord_ = F.col("last_line")
    keys = ["src_file", "name", "kind", "vtype", "labels_json"]

    nulls = [
        F.lit(None).cast("string").alias("value_s"),
        F.lit(None).cast(_BUCKETS_TYPE).alias("buckets"),
        F.lit(None).cast("long").alias("bucket_count"),
        F.lit(None).cast("double").alias("bucket_sum"),
    ]
    counters = (
        p.filter(F.col("kind") == "counter")
        .groupBy(keys)
        .agg(
            F.sum("value_i").alias("value_i"),
            F.sum("value_f").alias("value_f"),
            F.max_by("ts_us", ord_).alias("ts_us"),
        )
        .select(*keys, "value_i", "value_f", *nulls, "ts_us")
    )

    # per-column max_by over the same unique BIGINT ordering picks a
    # consistent row (codegen.py stage A uses the same shape); the
    # string column only enters for text programs
    lww_vals = [
        F.max_by("value_i", ord_).alias("value_i"),
        F.max_by("value_f", ord_).alias("value_f"),
        (
            F.max_by("value_s", ord_)
            if want("text")
            else F.lit(None).cast("string")
        ).alias("value_s"),
        F.max_by("ts_us", ord_).alias("out_ts"),
    ]
    lww = (
        p.filter(F.col("kind").isin("gauge", "timer", "text"))
        .groupBy(keys)
        .agg(*lww_vals)
        .select(
            *keys, "value_i", "value_f", "value_s",
            F.lit(None).cast(_BUCKETS_TYPE).alias("buckets"),
            F.lit(None).cast("long").alias("bucket_count"),
            F.lit(None).cast("double").alias("bucket_sum"),
            F.col("out_ts").alias("ts_us"),
        )
    )

    hist = p.filter(F.col("kind") == "histogram").withColumn(
        "buckets", F.from_json("buckets_json", _BUCKETS_TYPE)
    )
    hb = (
        hist.select(*keys, F.explode("buckets").alias("b"))
        .groupBy(*keys, F.col("b.le").alias("le"))
        .agg(F.sum("b.count").alias("cnt"))
        .groupBy(keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("le"), F.col("cnt").alias("count"))
                )
            ).alias("buckets"),
        )
    )
    hist_merged = (
        hb.join(
            hist.groupBy("src_file", "name", "labels_json").agg(
                F.sum("bucket_count").alias("bucket_count"),
                F.sum("bucket_sum").alias("bucket_sum"),
                F.max_by("ts_us", ord_).alias("ts_us"),
            ),
            ["src_file", "name", "labels_json"],
        )
        .select(
            *keys,
            F.lit(None).cast("long").alias("value_i"),
            F.lit(None).cast("double").alias("value_f"),
            F.lit(None).cast("string").alias("value_s"),
            "buckets", "bucket_count", "bucket_sum", "ts_us",
        )
    )

    branches = []
    if want("counter"):
        branches.append(counters)
    if want("gauge", "timer", "text"):
        branches.append(lww)
    if want("histogram"):
        branches.append(hist_merged)
    if not branches:
        branches.append(counters)
    per_file = branches[0]
    for b in branches[1:]:
        per_file = per_file.unionByName(b)
    return merge_parsed_partials(per_file, prog_name, kinds)


# ---------------------------------------------------------------- run


def _audit_chunks(finals) -> bool:
    """True when every file's zero-exchange chunks are internally
    ordered and pairwise non-overlapping line ranges — the contiguity
    phase A's speculation depends on.  Input-partition ordering is a
    documented property of the text source we rely on elsewhere, but
    an arbitrary caller-provided relation (parquet-backed, reordered)
    can break it, so it is VERIFIED from each chunk's (first, max)
    line rather than trusted.  `finals` are the SLIM finals rows
    (src_file, chunk, value_i=max_line, value_f=disorder flag) — the
    driver's only phase-B traffic, O(chunks) small tuples with no
    payloads."""
    byfile: dict = {}
    for r in finals:
        if r.value_f:  # in-chunk disorder flagged executor-side
            return False
        byfile.setdefault(r.src_file, []).append((r.chunk, r.value_i))
    for spans in byfile.values():
        spans.sort()
        for (c1, m1), (c2, _m2) in zip(spans, spans[1:]):
            if m1 >= c2:
                return False
    return True


def chunkfold_store(
    cprog,
    spark: SparkSession,
    log_lines: DataFrame,
    now_us: int = 0,
    _force_exchange: bool = False,
) -> DataFrame:
    """Run a register-RMW program chunk-parallel.  Semi-eager: phase A
    executes once (persisted at its store-sized output), phase B's
    control rows are collected and replayed driver-side, and the
    returned DataFrame reads the persisted partials + replay rows
    through the fold-equivalent merge."""
    from mtail_spark.session import (
        _parse_byte_size,
        ensure_workers_can_import,
        estimated_local_input_bytes,
    )

    ensure_workers_can_import(spark)

    pats = cprog._fold_prefilter_patterns()
    if pats and not cprog._java_compilable(spark, pats):
        pats = None
    if pats:
        cond = F.col("line").rlike(pats[0])
        for pat in pats[1:]:
            cond = cond | F.col("line").rlike(pat)
        log_lines = log_lines.filter(cond)

    # Size text-scan splits to cluster parallelism (text has no row
    # groups, so ensure_parallelism's parquet path doesn't apply), and
    # decide the chunking mode: when the scan itself plans enough
    # splits, the splits ARE the chunks — Spark's text source lists a
    # file's splits in offset order (the same guarantee
    # sources/logs.py's splittable line numbering rests on), so each
    # scan partition is one contiguous per-file line range and phase A
    # needs NO exchange and NO sort at all.  Otherwise (wholetext
    # reads, in-memory relations, few-split scans) fall back to an
    # explicit line_no-bucketed exchange.
    par = spark.sparkContext.defaultParallelism
    est = estimated_local_input_bytes(log_lines)
    splits = None
    if est:
        cur = _parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
        want = min(max(est // (par * 2), 131072), cur)
        if want != cur:
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(want)
            )
        splits = max(1, est // want)
    zero_exchange = (
        not _force_exchange
        and splits is not None
        and splits >= max(2, par // 2)
    )
    if zero_exchange:
        chunked = log_lines  # zero-exchange: scan splits are chunks
    else:
        chunked = (
            log_lines.withColumn(
                "__chunk",
                F.floor(
                    F.col("line_no") / F.lit(CHUNK_LINES)
                ).cast("long"),
            )
            .repartition(F.col("filename"), F.col("__chunk"))
            .sortWithinPartitions("filename", "__chunk", "line_no")
        )
    fn = _phase_a_fn(
        cprog.src,
        cprog.name,
        cprog.syslog_use_current_year,
        cprog.override_timezone,
        now_us,
    )
    df_a = chunked.mapInPandas(fn, schema=CHUNK_SCHEMA).persist()
    # Job 1 materializes phase A and brings back ONLY the slim audit
    # tuples — O(chunks) rows of (file, chunk, max_line, disorder).
    # Register snapshots and deferred raw lines (the O(chunks x
    # record-length) phase-B payloads the r5 review sized at ~10M
    # rows for 100 TB) never leave the executors.
    finals = (
        df_a.filter(F.col("row_type") == 1)
        .select("src_file", "chunk", "value_i", "value_f")
        .collect()
    )
    if zero_exchange and not _audit_chunks(finals):
        # the caller's relation doesn't deliver contiguous in-order
        # per-file ranges per partition: redo with an explicit
        # line_no-bucketed exchange (sound for any ordered relation)
        df_a.unpersist()
        return chunkfold_store(
            cprog, spark, log_lines, now_us, _force_exchange=True
        )

    out_cols = [
        c for c in _COLS if c not in ("row_type", "payload_json")
    ]
    # The merge job's inputs are store-sized rows spread over one
    # cached partition PER CHUNK; without narrowing, each branch pays
    # a task per chunk (648 chunks -> ~1300 near-empty tasks, ~5 s of
    # pure scheduling at 30M lines/10x-split sizing).  coalesce is a
    # narrow read over the cache — no shuffle, parallelism capped at
    # the cluster width either way by the store-agg exchange.
    ncoal = max(2, spark.sparkContext.defaultParallelism // 2)
    merged_src = df_a.coalesce(ncoal)
    partials = merged_src.filter(F.col("row_type") == 0).select(out_cols)
    if finals:
        # Phase B rides the merge job: per-file replay as a grouped
        # map over the persisted control rows.  One file's replay is
        # inherently sequential (it IS the fold of that file's
        # deferred lines), but files replay in parallel on executors
        # and the driver pass over deferred prefixes is gone.
        rfn = _replay_fn(
            cprog.src,
            cprog.name,
            cprog.syslog_use_current_year,
            cprog.override_timezone,
            now_us,
        )
        replayed = (
            merged_src.filter(F.col("row_type") != 0)
            .groupBy("src_file")
            .applyInPandas(rfn, schema=CHUNK_SCHEMA)
            .select(out_cols)
        )
        partials = partials.unionByName(replayed)
    else:
        # zero input rows: the store is still the zero-init store
        # (reference one-shot over an empty file exports zero-valued
        # scalar counters/histograms; the vectorized backend's
        # identity-event union gives the same)
        zero = _partials_with_tags(TrackingStore(cprog.checked), "")
        loc = spark.createDataFrame(
            [tuple(r[c] for c in _COLS) for r in zero],
            schema=CHUNK_SCHEMA,
        ).select(out_cols)
        partials = partials.unionByName(loc)
    out = _merge_chunk_partials(
        partials, cprog.name, kinds=cprog.exported_kinds
    )
    # keep a handle so callers/tests can unpersist the phase-A cache
    out._chunkfold_cache = df_a
    return out
