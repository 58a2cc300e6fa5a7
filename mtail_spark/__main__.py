"""mtail-spark CLI — the reference binary's interface, Spark-backed.

    python -m mtail_spark --progs DIR --logs GLOB --one_shot [--format golden|json]
    python -m mtail_spark --progs DIR --logs GLOB --port 3903
    python -m mtail_spark --progs DIR --address HOST:PORT --port 3903   # socket

One-shot mode reads the logs once, runs every *.mtail program, and
dumps the store (reference cmd/mtail one-shot).  Serve mode tails the
log glob via Structured Streaming and exposes /metrics /json /varz
/graphite (reference internal/mtail/mtail.go HTTP surface).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def _load_programs(progs_dir: str, max_regexp_length: int = 1024,
                   max_recursion_depth: int = 100,
                   syslog_use_current_year: bool = False,
                   override_timezone: str | None = None):
    from mtail_spark.compiler.api import compile_program

    progs = []
    for path in sorted(glob.glob(os.path.join(progs_dir, "*.mtail"))):
        name = os.path.basename(path)
        try:
            progs.append(compile_program(
                open(path).read(), name,
                syslog_use_current_year=syslog_use_current_year,
                max_regexp_length=max_regexp_length,
                max_recursion_depth=max_recursion_depth,
                override_timezone=override_timezone,
            ))
        except Exception as e:  # mirror the reference: bad programs are
            print(f"error compiling {name}: {e}", file=sys.stderr)
    if not progs:
        print("no programs loaded", file=sys.stderr)
        sys.exit(1)
    return progs


def _golden_dump(rows) -> str:
    from mtail_spark.compiler.gotime import format_epoch_us_rfc3339

    out = []
    for r in sorted(rows, key=lambda r: (r["name"], str(r["labels"]))):
        labels = r["labels"] or {}
        lab = (
            "{" + ",".join(f"{k}={v}" for k, v in sorted(labels.items())) + "} "
            if labels
            else ""
        )
        if r["vtype"] == "Int":
            val = r["value_i"]
        elif r["vtype"] == "Float":
            val = r["value_f"]
        elif r["vtype"] == "Buckets":
            val = r["bucket_sum"]
        else:
            val = r["value_s"]
        ts = (
            format_epoch_us_rfc3339(r["ts_us"])
            if r["ts_us"] is not None
            else ""
        )
        out.append(f"{r['kind']} {r['name']} {lab}{val} {ts}".rstrip())
    return "\n".join(out)


def _is_spoolable(url: str) -> bool:
    """fifo:// udp:// unixgram:// URLs, or a path that stats as a FIFO
    (the reference auto-detects named pipes by stat, logstream.go)."""
    import stat as _stat

    if url.startswith(("fifo://", "udp://", "unixgram://")):
        return True
    try:
        return _stat.S_ISFIFO(os.stat(url).st_mode)
    except OSError:
        return False


def _devtool(argv) -> int:
    """`fmt` / `dot` subcommands (reference cmd/mfmt, cmd/mdot)."""
    ap = argparse.ArgumentParser(prog=f"mtail-spark {argv[0]}")
    ap.add_argument("prog", help="mtail program file")
    if argv[0] == "fmt":
        ap.add_argument("--write", action="store_true",
                        help="rewrite the file in place")
    args = ap.parse_args(argv[1:])
    src = open(args.prog).read()
    from mtail_spark.compiler.unparse import dot_source, format_source

    if argv[0] == "dot":
        sys.stdout.write(dot_source(src, os.path.basename(args.prog)))
        return 0
    out = format_source(src)
    if getattr(args, "write", False):
        open(args.prog, "w").write(out)
    else:
        sys.stdout.write(out)
    return 0


def main(argv=None):
    # dev-tool subcommands (reference cmd/mfmt, cmd/mdot): no Spark
    # session, print to stdout, exit
    argv_ = sys.argv[1:] if argv is None else argv
    if argv_ and argv_[0] in ("fmt", "dot"):
        return _devtool(argv_)

    ap = argparse.ArgumentParser(prog="mtail-spark")
    ap.add_argument("--progs", required=True, help="directory of *.mtail programs")
    ap.add_argument("--logs", help="log file glob to read/tail")
    ap.add_argument("--address", help="HOST:PORT socket source (serve mode)")
    ap.add_argument("--one_shot", action="store_true",
                    help="read logs once, dump the store, exit")
    ap.add_argument("--format", "--one_shot_format", dest="format",
                    default="golden",
                    choices=["golden", "json", "prometheus"],
                    help="one-shot dump format")
    ap.add_argument("--compile_only", action="store_true",
                    help="compile the programs, report errors, exit")
    ap.add_argument("--dump_ast", action="store_true",
                    help="dump each program's AST as graphviz dot to "
                         "stdout after parsing (reference --dump_ast)")
    ap.add_argument("--ignore_filename_regex_pattern",
                    help="skip log files whose BASENAME matches this "
                         "regex (reference flag of the same name)")
    ap.add_argument("--emit_prog_label", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="emit the 'prog' label in variable exports")
    ap.add_argument("--emit_metric_timestamp", default=False,
                    action=argparse.BooleanOptionalAction,
                    help="emit the recorded timestamp of a metric in "
                         "/metrics output")
    ap.add_argument("--port", type=int, default=3903,
                    help="HTTP port for /metrics /json /varz /graphite")
    ap.add_argument("--unix_socket",
                    help="serve the HTTP endpoints on this unix-domain "
                         "socket path instead of a TCP port (reference "
                         "cmd/mtail/main.go flag)")
    ap.add_argument("--syslog_use_current_year", action="store_true")
    ap.add_argument("--max_regexp_length", type=int, default=1024,
                    help="reject programs whose regexps exceed this "
                         "length (0 disables; reference flag)")
    ap.add_argument("--max_recursion_depth", type=int, default=100,
                    help="reject programs nested deeper than this "
                         "(0 disables; reference flag)")
    ap.add_argument("--override_timezone",
                    help="IANA timezone for strptime wall clocks whose "
                         "layout carries no zone (reference flag; "
                         "default UTC)")
    ap.add_argument("--table_store_dir",
                    help="serve metrics from a parquet-backed table "
                         "at this directory instead of the driver-RAM "
                         "store (engine extension: the 100x-label-"
                         "cardinality escape hatch — per-batch merges "
                         "run as Spark jobs and never collect the "
                         "store to the driver)")
    ap.add_argument("--poll_interval", type=float, default=0.25,
                    help="seconds between stat polls of each tailed "
                         "log file in serve mode (reference "
                         "cmd/mtail/main.go:65); appends, in-place "
                         "truncation (copytruncate) and rotations are "
                         "picked up at this cadence")
    ap.add_argument("--progs_poll_interval", type=float, default=1.0,
                    help="seconds between progs-dir reload scans in "
                         "serve mode (0 disables; SIGHUP always "
                         "triggers a scan)")
    ap.add_argument("--graphite_host_port",
                    help="serve mode: push graphite plaintext to "
                         "HOST:PORT (TCP) every --metric_push_interval")
    ap.add_argument("--statsd_hostport",
                    help="serve mode: push statsd lines to HOST:PORT "
                         "(UDP) every --metric_push_interval")
    ap.add_argument("--collectd_socketpath",
                    help="serve mode: write collectd PUTVAL commands "
                         "to this unixsock path every "
                         "--metric_push_interval")
    ap.add_argument("--metric_push_interval", type=float, default=60.0,
                    help="seconds between metric pushes")
    ap.add_argument("--metric_push_write_deadline", type=float,
                    default=10.0,
                    help="per-push socket write deadline in seconds")
    ap.add_argument("--one_shot_timeout_secs", type=float, default=30.0,
                    help="one-shot FIFO/datagram drain deadline; the "
                         "drain ends early on source EOF (writer "
                         "close / zero-length datagram)")
    ap.add_argument("--checkpoint_dir",
                    help="serve mode: directory for streaming "
                         "checkpoints + store snapshots; a restarted "
                         "daemon resumes exactly-once (committed "
                         "offsets + batch_id dedupe), matching the "
                         "reference's no-double-count restart")
    args = ap.parse_args(argv)

    if args.dump_ast:
        # parse-level dump, no Spark session (reference --dump_ast)
        from mtail_spark.compiler.unparse import dot_source

        for path in sorted(
            glob.glob(os.path.join(args.progs, "*.mtail"))
        ):
            sys.stdout.write(
                dot_source(open(path).read(), os.path.basename(path))
            )
        if not args.compile_only and not (args.one_shot or args.logs
                                          or args.address):
            return 0
    if args.compile_only:
        # compile + report, no Spark session (reference --compile_only)
        from mtail_spark.compiler.api import compile_program

        ok = True
        for path in sorted(
            glob.glob(os.path.join(args.progs, "*.mtail"))
        ):
            name = os.path.basename(path)
            try:
                compile_program(
                    open(path).read(), name,
                    max_regexp_length=args.max_regexp_length,
                    max_recursion_depth=args.max_recursion_depth,
                )
                print(f"{name}: OK")
            except Exception as e:
                ok = False
                print(f"{name}: {e}", file=sys.stderr)
        return 0 if ok else 1

    from mtail_spark.session import get_spark

    spark = get_spark("mtail-spark")
    progs = _load_programs(
        args.progs, args.max_regexp_length, args.max_recursion_depth,
        syslog_use_current_year=args.syslog_use_current_year,
        override_timezone=args.override_timezone,
    )

    if args.one_shot:
        if not args.logs:
            ap.error("--one_shot requires --logs")
        from mtail_spark.exporters import to_json
        from mtail_spark.sources.logs import read_log_lines

        if args.logs == "-":
            # stdin (reference: `-` / /dev/stdin log path)
            import tempfile

            tmp = tempfile.NamedTemporaryFile(
                "w", suffix=".log", delete=False
            )
            tmp.write(sys.stdin.read())
            tmp.close()
            args.logs = tmp.name
        if args.ignore_filename_regex_pattern and not _is_spoolable(
            args.logs
        ):
            # reference flag: drop files whose basename matches
            import re as _re

            pat = _re.compile(args.ignore_filename_regex_pattern)
            matched = [
                f for f in glob.glob(args.logs)
                if not pat.search(os.path.basename(f))
            ]
            if not matched:
                print("no log files after ignore filter",
                      file=sys.stderr)
                return 1
            args.logs = matched
        if isinstance(args.logs, str) and _is_spoolable(args.logs):
            # FIFO / datagram one-shot: drain the source until it goes
            # quiet, then read the staged spool (reference one-shot
            # semantics: read until EOF)
            import tempfile

            from mtail_spark.sources.spool import (
                drain_one_shot,
                open_spooler,
                spool_lines_batch,
            )

            spooler = open_spooler(
                args.logs, tempfile.mkdtemp(prefix="mtail-spool-")
            )
            drain_one_shot(spooler,
                           timeout_secs=args.one_shot_timeout_secs)
            lines = spool_lines_batch(spark, spooler)
        else:
            lines = read_log_lines(spark, args.logs)
        if len(progs) > 1:
            # N programs share one scan: persist the line relation
            # once (single persist call on one DataFrame object — the
            # repeated-persist cache-layering trap doesn't apply).
            # MEMORY_AND_DISK spills rather than OOMs on huge logs.
            from pyspark import StorageLevel

            lines = lines.persist(StorageLevel.MEMORY_AND_DISK)
        all_rows = []
        for prog in progs:
            df = prog.run_batch(spark, lines)
            all_rows.extend(r.asDict() for r in df.collect())
        if len(progs) > 1:
            lines.unpersist()
        if args.format == "json":
            print(to_json(all_rows))
        elif args.format == "prometheus":
            from mtail_spark.exporters import to_prometheus

            print(to_prometheus(
                all_rows,
                omit_prog_label=not args.emit_prog_label,
                emit_timestamps=args.emit_metric_timestamp,
            ))
        else:
            print(_golden_dump(all_rows))
        return 0

    # serve mode
    from mtail_spark.exporters import MetricsServer

    stores = []
    queries = []
    pset = None
    tailer = None

    def _prog_ckpt(prog):
        """Per-program checkpoint dir under --checkpoint_dir (None
        when checkpointing is off).  The socket source is not
        replayable, but offsets still dedupe the in-flight batch; the
        spool/file sources get full exactly-once replay."""
        if not args.checkpoint_dir:
            return None
        base = os.path.join(
            args.checkpoint_dir, prog.name.replace("/", "_")
        )
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, "offsets")

    if args.address:
        host, port = args.address.rsplit(":", 1)
        from mtail_spark.sources.sockets import read_socket_lines
        from mtail_spark.streaming.stateful import run_stateful_stream

        for prog in progs:
            stream = read_socket_lines(spark, host, int(port))
            runner, q = run_stateful_stream(
                prog, spark, stream, order="round_robin",
                trigger={"processingTime": "1 seconds"},
                checkpoint=_prog_ckpt(prog),
            )
            stores.append(runner)
            queries.append(q)
    elif args.logs and _is_spoolable(args.logs):
        # FIFO / datagram serve mode: driver-side spooler stages lines
        # into a replayable spool dir; the file streaming source tails
        # it (checkpointable, unlike the socket source)
        import tempfile

        from mtail_spark.sources.spool import (
            open_spooler,
            spool_lines_stream,
        )
        from mtail_spark.streaming.stateful import run_stateful_stream

        spooler = open_spooler(
            args.logs, tempfile.mkdtemp(prefix="mtail-spool-")
        )
        spooler.start()
        for prog in progs:
            stream = spool_lines_stream(spark, spooler)
            runner, q = run_stateful_stream(
                prog, spark, stream,
                trigger={"processingTime": "1 seconds"},
                checkpoint=_prog_ckpt(prog),
            )
            stores.append(runner)
            queries.append(q)
    elif args.logs:
        import tempfile

        from mtail_spark.compiler.api import compile_program
        from mtail_spark.sources.filetail import (
            FileTailSpooler,
            filetail_lines_stream,
        )
        from mtail_spark.streaming import run_program_stream
        from mtail_spark.streaming.reload import ProgramSet
        from mtail_spark.streaming.stateful import run_stateful_stream

        # In-place tailer (appends + copytruncate + rotation; Spark's
        # file source alone reads a file only once at discovery).  The
        # spool root lives under --checkpoint_dir when given so a
        # restarted server resumes tail offsets with its checkpoints.
        tail_root = (
            os.path.join(args.checkpoint_dir, "tailspool")
            if args.checkpoint_dir
            else tempfile.mkdtemp(prefix="mtail-tail-")
        )
        # Daemon parity: files already present at startup seek to EOF
        # ("ignore the past", reference filestream.go:69-74); persisted
        # offsets from a previous run still take precedence, so a
        # checkpointed restart never skips bytes it hadn't read.
        tailer = FileTailSpooler(
            args.logs, tail_root, poll_interval=args.poll_interval,
            read_existing_from_start=False,
        )
        tailer.start()

        def serve_compile(src, name):
            # Thread every compile-affecting CLI flag through the
            # reload path too — ProgramSet recompiles on SIGHUP/poll,
            # and a callback that dropped these would silently lose
            # --override_timezone and the limit guards in serve mode.
            return compile_program(
                src, name,
                syslog_use_current_year=args.syslog_use_current_year,
                max_regexp_length=args.max_regexp_length,
                max_recursion_depth=args.max_recursion_depth,
                override_timezone=args.override_timezone,
            )

        def start_prog(prog):
            ckpt = snap = None
            if args.checkpoint_dir:
                base = os.path.join(
                    args.checkpoint_dir,
                    prog.name.replace("/", "_"),
                )
                ckpt = os.path.join(base, "offsets")
                snap = os.path.join(base, "store.json")
                os.makedirs(base, exist_ok=True)
            if prog.vectorizable:
                tstore = None
                if args.table_store_dir:
                    from mtail_spark.streaming.tablestore import (
                        TableMetricStore,
                    )

                    tstore = TableMetricStore(
                        prog, spark,
                        os.path.join(
                            args.table_store_dir,
                            prog.name.replace("/", "_"),
                        ),
                    )
                return run_program_stream(
                    prog, spark, args.logs,
                    store=tstore,
                    checkpoint=ckpt, store_path=snap,
                    ignore_basename_regex=(
                        args.ignore_filename_regex_pattern
                    ),
                    source=filetail_lines_stream(spark, tailer),
                )
            from pyspark.sql import functions as F

            lines = filetail_lines_stream(spark, tailer)
            if args.ignore_filename_regex_pattern:
                lines = lines.filter(
                    ~F.element_at(
                        F.split(F.col("filename"), "/"), -1
                    ).rlike(args.ignore_filename_regex_pattern)
                )
            return run_stateful_stream(prog, spark, lines, checkpoint=ckpt)

        # Hot reload (reference runtime.go:310-332): the ProgramSet
        # owns the per-program queries; a SIGHUP or the poll watcher
        # rescans --progs and swaps changed programs live.
        pset = ProgramSet(serve_compile, start_prog)
        pset.scan(args.progs)
        if args.progs_poll_interval > 0:
            pset.watch(args.progs, interval=args.progs_poll_interval)
        try:
            import signal

            signal.signal(
                signal.SIGHUP, lambda *_: pset.scan(args.progs)
            )
        except (ValueError, AttributeError, OSError):
            pass  # non-main thread or platform without SIGHUP
    else:
        ap.error("serve mode needs --logs or --address")

    if pset is not None:
        provider = pset.rows

        def active():
            return pset.any_active()
    else:
        def provider():
            rows = []
            for s in stores:
                rows.extend(s.rows())
            return rows

        def active():
            return any(q.isActive for q in queries)

    srv = MetricsServer(
        provider, host="0.0.0.0", port=args.port,
        emit_prog_label=args.emit_prog_label,
        emit_metric_timestamp=args.emit_metric_timestamp,
        unix_socket=args.unix_socket,
    ).start()
    where = args.unix_socket or f":{srv.port}"
    print(f"serving on {where} (/metrics /json /varz /graphite)",
          file=sys.stderr)
    from mtail_spark.exporters.push import PushScheduler

    pusher = PushScheduler(
        provider,
        interval_secs=args.metric_push_interval,
        graphite_hostport=args.graphite_host_port,
        statsd_hostport=args.statsd_hostport,
        collectd_socketpath=args.collectd_socketpath,
        write_deadline_secs=args.metric_push_write_deadline,
    ).start()
    try:
        while active():
            time.sleep(1)
    except KeyboardInterrupt:
        pass
    finally:
        pusher.stop(final_push=True)
        srv.stop()
        if pset is not None:
            pset.stop()
        for q in queries:
            q.stop()
        if tailer is not None:
            # flush the final unterminated line and persist offsets
            # (reference reader.go Finish) — after the queries stop so
            # the tail thread isn't racing a draining micro-batch.
            tailer.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
