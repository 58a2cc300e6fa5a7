"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[$SPARK_GRAFT_CPUS]; the same settings are
what we would ship on a 1000-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for any
Python<->JVM hop, and shuffle partitions sized to the parallelism at
hand (at cluster scale AQE coalesces; the static number is only the
upper bound of the first shuffle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _default_driver_mem(cap_gb: int = 24) -> str:
    """min(cap_gb, ~60% of physical RAM), floor 2g.  SPARK_DRIVER_MEM
    always overrides."""
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        gb = max(2, min(cap_gb, int(total * 0.6 / (1 << 30))))
    except (ValueError, OSError, AttributeError):
        gb = 8
    return f"{gb}g"


def get_spark(
    app_name: str = "mtail-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local mode: executors live in the driver JVM, so the driver
        # heap IS the cluster memory — size it like one (32 threads x
        # cached relations spill/GC-thrash in a small heap), but never
        # assume a big bench host: cap at ~60% of physical RAM so the
        # JVM + Arrow workers don't get OOM-killed on small machines
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", _default_driver_mem()))
        # Broadcast joins for dimension tables up to 64 MB — at 100 TB the
        # fact side never moves for dim joins.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Some inputs carry parquet TIMESTAMP(NANOS) which the Spark
        # reader rejects; read them as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4's DataFrame-context debugging wraps EVERY
        # DataFrame API call with a call-site capture: one conf.get +
        # a PySparkCurrentOrigin set/clear pair = ~3 extra py4j round
        # trips per call.  Plan-heavy queries (compiled mtail
        # programs: ~400 API calls per build) spend 30-40% of their
        # driver-side construction in it (optimization r13, guide §7.3
        # driver-side work; measured: dhcpd run_batch build 0.80 →
        # 0.52 s).  Cost: error messages lose the user-code call-site
        # line — acceptable for a library engine.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Whole-stage codegen is silently DISABLED for operators with
        # more than spark.sql.codegen.maxFields (100) fields — and a
        # compiled mtail program's shared-regex projection carries
        # ~70 hoisted columns, so the entire regex pipeline of every
        # multi-site program ran on the interpreted Volcano path
        # (optimization r13, guide §1/§7.2; measured: the dhcpd
        # 70-column projection 1.89 s → 0.05 s at sf1 once compiled).
        .config("spark.sql.codegen.maxFields", "1024")
    )
    # Janino-generated methods for WIDE projections (the per-line
    # event-array build: ~27-38 KB of bytecode for an 18-site
    # program) exceed HotSpot's DontCompileHugeMethods threshold
    # (8 KB), so they run in the BYTECODE INTERPRETER — measured
    # ~64 core-us/line on dhcpd's event projection, 2x recovered by
    # letting the JIT compile them.  Standard practice for wide Spark
    # codegen; applied to driver (local mode: executors live there)
    # AND executors (cluster deployments).  User-supplied options are
    # preserved (appended after ours so theirs win on conflict).
    _jit = "-XX:-DontCompileHugeMethods"
    merged = dict(extra_conf or {})
    for _k in ("spark.driver.extraJavaOptions",
               "spark.executor.extraJavaOptions"):
        _user = merged.get(_k, "")
        if _jit not in _user:
            merged[_k] = f"{_jit} {_user}".strip()
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _prewarm_python_workers(spark, cpus)
    return spark


_PREWARMED: set = set()


def _prewarm_python_workers(spark: SparkSession, cpus: int) -> None:
    """Fire-and-forget a tiny mapInPandas job that faults in every
    Python worker slot (pandas/numpy/pyarrow imports plus the
    interpreter modules phase A needs) while the caller is still
    loading data and building plans.  A 32-slot local session
    otherwise pays ~3.5 s of worker cold-start inside the FIRST
    pandas-path query (measured on mtail_prog_txn sf1); daemons warm
    pools at startup for exactly this reason.  Workers are reused
    across jobs (spark.python.worker.reuse default), so the warmth
    persists.  Off via SPARK_GRAFT_PREWARM=0."""
    key = id(spark.sparkContext)
    if key in _PREWARMED or os.environ.get(
        "SPARK_GRAFT_PREWARM", "1"
    ) == "0":
        return
    _PREWARMED.add(key)

    def _job():
        try:
            def warm(batches):
                import numpy  # noqa: F401
                import pandas as pd

                import mtail_spark.compiler.interp  # noqa: F401

                for _ in batches:
                    pass
                yield pd.DataFrame({"n": [0]})

            ensure_workers_can_import(spark)
            spark.range(0, cpus * 2, 1, cpus * 2).mapInPandas(
                warm, schema="n long"
            ).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # prewarm is best-effort; never break session startup

    import threading

    threading.Thread(target=_job, daemon=True).start()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


_SHIPPED: set = set()

# Session identity for caches: id(spark) is unsafe as a cache key
# (CPython reuses addresses after GC, so a new session could silently
# inherit cached DataFrames bound to a dead one).  The token pairs the
# context's applicationId with a uuid minted per live session object;
# the WeakKeyDictionary guarantees a GC'd session's token dies with it.
_SESSION_TOKENS = None


def session_token(spark: SparkSession) -> str:
    """A cache-key-stable identity for a live SparkSession."""
    global _SESSION_TOKENS
    import uuid
    import weakref

    if _SESSION_TOKENS is None:
        _SESSION_TOKENS = weakref.WeakKeyDictionary()
    tok = _SESSION_TOKENS.get(spark)
    if tok is None:
        try:
            app = spark.sparkContext.applicationId
        except Exception:
            app = "noapp"
        tok = f"{app}:{uuid.uuid4().hex[:12]}"
        _SESSION_TOKENS[spark] = tok
    return tok


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Python workers must import mtail_spark for the applyInPandas /
    mapInPandas paths.  If the host session was created without the
    repo on PYTHONPATH, ship the package as a zip via addPyFile (idempotent
    per session)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(
        tempfile.gettempdir(), f"mtail_spark_pkg_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip", os.path.dirname(pkg_dir), "mtail_spark"
    )
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # local mode with shared PYTHONPATH still works
    _SHIPPED.add(key)


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (unsupported by the
    Spark vectorized reader) — detected from the footer via pyarrow."""
    import pyarrow.dataset as ds
    import pyarrow as pa

    schema = ds.dataset(path, format="parquet").schema
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


# Per-session table-metadata cache: keyed by (path, mtime_ns, size) so
# a rewritten file is a guaranteed miss.  spark.read.parquet costs
# ~0.1 s of schema-inference JVM round-trips per call; at bench scale
# that fixed cost is 15-20% of a sub-second query's measured wall (the
# r8 sim_topk_gemm drift investigation), and a real engine caches
# catalog metadata exactly like this.  DataFrames are immutable plans,
# so reuse within one session is semantically identical; file CONTENTS
# are still read at each execution.  The cache dict lives as an
# ATTRIBUTE ON THE SESSION OBJECT, not in a module global: cached
# DataFrames strongly reference their session, so a global registry
# (even weak-keyed) would pin every session it ever saw for process
# lifetime; an attribute dies with the session (r9 review finding).
_TABLE_CACHE_ATTR = "_mtail_table_cache"


def load_table(spark: SparkSession, sf_dir_: str, name: str):
    """Read a testdata parquet, normalizing nanosecond timestamps to
    Spark TimestampType (microseconds, integer division — ns values
    exceed double precision so no float math here).  Plan objects are
    memoized per (session, path, mtime, size) — see _TABLE_CACHE_ATTR."""
    path = f"{sf_dir_}/{name}.parquet"
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    per_session = getattr(spark, _TABLE_CACHE_ATTR, None)
    if per_session is None:
        per_session = {}
        try:
            setattr(spark, _TABLE_CACHE_ATTR, per_session)
        except AttributeError:  # __slots__-restricted session type
            pass
    hit = per_session.get(key)
    if hit is not None:
        return hit
    try:
        # timestamps are compared against a tz-naive oracle; normalize
        # rendering/extraction to UTC regardless of the host session
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    ns_cols = _nanos_ts_columns(path)
    if ns_cols:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # already set via builder, or not settable at runtime
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    per_session[key] = df
    return df


def _parse_byte_size(s) -> int:
    s = str(s).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    units = {"k": 1024, "m": 1024 ** 2, "g": 1024 ** 3, "t": 1024 ** 4}
    mult = 1
    if s and s[-1] in units:
        mult = units[s[-1]]
        s = s[:-1]
    return int(float(s)) * mult


def ensure_parallelism(df, spark=None, tune_only: bool = False):
    """Repartition a batch DataFrame to cluster parallelism when its
    scan would plan far fewer splits than cores.

    tune_only=True applies ONLY the shuffle-free branch (retuning
    spark.sql.files.maxPartitionBytes when the file carries enough
    row groups) and never falls back to a repartition exchange: the
    right mode for operators whose post-exchange stages already
    parallelize — a tiny single-row-group input keeps its plan, a
    production-sized multi-row-group input gets a free parallel scan
    (optimization r12; measured on band_join_counts sf1: 2.9 s → 1.0 s
    from the tune branch, while the repartition fallback at sf0.1
    only added its own exchange cost).

    Split planning is byte-based, but snappy parquet decompresses
    10-30x and CPU-heavy per-row work (regex extraction, rendering)
    wants one task per core regardless of input bytes.  The split
    count is ESTIMATED from input file sizes — analysis-level only;
    asking the DataFrame itself (df.rdd.getNumPartitions) physically
    plans and codegens an RDD conversion, ~1.5 s per call on a
    non-trivial plan.

    Callers must only use this where row order is carried as data
    columns (our log_lines relation always does).
    """
    import math
    import os
    from urllib.parse import unquote, urlparse

    if df.isStreaming:
        return df
    spark = spark or df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    # idempotence: composed pipelines (render helper + run_batch) both
    # call this; a second round-robin exchange of the same rows is
    # pure shuffle waste.  The parsed logical plan is available
    # without planning a job.
    try:
        if "Repartition" in df._jdf.queryExecution().analyzed().toString():
            return df
    except Exception:
        pass
    # Estimate splits under the session's ORIGINAL maxPartitionBytes,
    # not the current value: the tuning branch below retunes the conf
    # per dataset, so estimating from the live conf made the
    # repartition decision depend on which dataset was planned EARLIER
    # in the session (same query, ±1 Exchange — caught by the plan-
    # fingerprint pin).  Fresh-session shape is what SCALE.md/PLANS.md
    # audit; every session now plans it deterministically.
    mpb = _default_scan_mpb(spark)
    est = 0
    paths = []
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return df  # remote store: trust the source's planning
        p = unquote(u.path)
        try:
            size = os.path.getsize(p)
        except OSError:
            return df
        paths.append(p)
        total += size
        est += max(1, math.ceil(size / mpb))
    # A task can read at most one whole row group, so the achievable
    # scan parallelism is min(byte-splits, row groups) — a 50 MB file
    # with one row group plans multiple splits but only one does work.
    rgs = _count_row_groups(paths)
    enough = max(2, par // 2)
    if rgs is None:
        if est >= enough or tune_only:
            return df
        return df.repartition(par)
    if rgs >= enough:
        # Enough row groups: tuning spark.sql.files.maxPartitionBytes
        # re-plans the scan to cluster parallelism with NO shuffle
        # (the conf is consulted lazily at action time).  A 1.4 s
        # round-robin exchange of 1M rows becomes a free parallel
        # scan.  The conf is session-global, so size it for THIS
        # dataset in BOTH directions each call — a value left behind
        # by a smaller dataset would plan hundreds of empty splits
        # here (~3 ms of task latency each, measured +1.6 s on a
        # 64-row-group scan planned at a stale 128 KB).
        # ~3 splits per core: row-group boundaries make byte-splits
        # uneven (a task reads 1-3 whole groups), so finer tasks
        # smooth the stragglers; measured 1.4x on the 27-site dhcpd
        # program vs one-split-per-core
        want = min(max(total // (par * 3), 131072),
                   _default_scan_mpb(spark))
        # A query composing SEVERAL tuned inputs reads the conf once
        # at action time, so the last-planned dataset used to win —
        # and a small input planned last de-parallelized a large
        # input's scan into hundreds of tiny splits (ADVICE r12).
        # Scope the tune to the LARGEST want since the last
        # reset_scan_tuning: one conf cannot serve both sizes, and
        # coarse splits on the small side cost far less than
        # thousands of ~3 ms empty-split tasks on the large side.
        key = id(spark.sparkContext)
        prev = _TUNED_WANT.get(key)
        if prev is not None:
            want = max(want, prev)
        _TUNED_WANT[key] = want
        live = _parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
        if want != live:
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(want))
        return df
    if est >= enough or tune_only:
        return df
    return df.repartition(par)


_DEFAULT_MPB: dict = {}

# per-session largest ensure_parallelism want since the last
# reset_scan_tuning (see the tune branch above)
_TUNED_WANT: dict = {}


def _default_scan_mpb(spark) -> int:
    """The session's original spark.sql.files.maxPartitionBytes,
    remembered before ensure_parallelism first tunes it."""
    key = id(spark.sparkContext)
    if key not in _DEFAULT_MPB:
        _DEFAULT_MPB[key] = _parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
    return _DEFAULT_MPB[key]


_DEFAULT_SP: dict = {}


def default_shuffle_partitions(spark) -> int:
    """The session's original spark.sql.shuffle.partitions, remembered
    before tune_store_shuffle first lowers it."""
    key = id(spark.sparkContext)
    if key not in _DEFAULT_SP:
        _DEFAULT_SP[key] = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    return _DEFAULT_SP[key]


def store_shuffle_partitions(spark, input_bytes) -> int:
    """Reduce-side partition count for a compiled program's store
    aggregation, sized from the INPUT bytes.

    The store agg's shuffle volume is maps x store-size (map-side
    partial aggregation), so its reduce side is tiny at small inputs
    — yet it inherits the session's shuffle.partitions, and AQE
    coalescing does not recover the scheduling cost of the extra
    reduce tasks (measured ~0.3 s of a 1.8 s dhcpd sf0.1 run across
    the plan's two agg exchanges).  Scale with input size instead:
    one reduce partition per ~32 MB of input, floored at 8 (keep some
    reduce parallelism for wide label spaces), capped at the session
    default so a real cluster's thousands-of-partitions setting wins
    at 100 TB.  Partition count never affects results — the agg's
    merge is associative and its last-write picks order by a unique
    (line_no, site) / (ts, filename) key."""
    cap = default_shuffle_partitions(spark)
    if input_bytes is None:
        return cap
    return max(8, min(cap, (input_bytes >> 25) + 1))


def tune_store_shuffle(spark, input_bytes) -> int | None:
    """Apply store_shuffle_partitions to the session (consulted
    lazily at action time, like maxPartitionBytes — same single-tuner
    invariant: act on the plan before building an unrelated one).
    Returns the applied value, or None when left at the default."""
    sp = store_shuffle_partitions(spark, input_bytes)
    if sp >= default_shuffle_partitions(spark):
        return None
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    return sp


def reset_scan_tuning(spark) -> None:
    """Restore the original maxPartitionBytes and shuffle.partitions.
    ensure_parallelism / tune_store_shuffle size the (session-global)
    confs for the dataset they are handed; callers running unrelated
    plans afterwards in the same session (bench harness, mixed
    pipelines) call this to shed the tuning."""
    key = id(spark.sparkContext)
    _TUNED_WANT.pop(key, None)
    if key in _DEFAULT_MPB:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(_DEFAULT_MPB[key])
        )
    if key in _DEFAULT_SP:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(_DEFAULT_SP[key])
        )


def _count_row_groups(paths, cap: int = 64) -> int | None:
    """Total parquet row groups across local files (footer reads are
    ~ms each; capped to avoid pathological file counts).  None when a
    footer is unreadable or a file isn't parquet."""
    try:
        import pyarrow.parquet as pq
    except Exception:
        return None
    n = 0
    for p in paths[:cap]:
        try:
            n += pq.ParquetFile(p).metadata.num_row_groups
        except Exception:
            return None
    return n


def estimated_local_input_bytes(df) -> int | None:
    """Total bytes of a DataFrame's local input files, or None when
    the inputs aren't local files (remote stores, streaming
    micro-batches, in-memory relations).  Analysis-level only — no
    job, no physical planning."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    from urllib.parse import unquote, urlparse

    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(unquote(u.path))
        except OSError:
            return None
    return total
