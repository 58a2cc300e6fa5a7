"""Demo mtail programs run by the driver's correctness gate.

Each program runs over log lines RENDERED from the events table (the
engine's universal input is text lines), through the real compiler and
vectorized backend; the DuckDB oracle reproduces the whole pipeline —
rendering, regex extraction, aggregation — in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtail_spark.compiler.api import compile_program
from mtail_spark.sources.logs import log_lines_from_df

# line: "<iso-ts> <type> user=<id> val=<cents> <props-json>"
LINE_RE = r"^(?P<dt>\S+) (?P<type>\w+) user=(?P<user>\d+) val=(?P<cents>\d+)"

COUNTER_PROG = f"""
counter events_total
counter by_type by type
counter cents_total by type

/{LINE_RE.replace('/', chr(92) + '/')}/ {{
  strptime($dt, "2006-01-02T15:04:05")
  events_total++
  by_type[$type]++
  cents_total[$type] += $cents
}}
"""

GAUGE_PROG = f"""
gauge last_cents by type

/{LINE_RE.replace('/', chr(92) + '/')}/ {{
  strptime($dt, "2006-01-02T15:04:05")
  last_cents[$type] = $cents
}}
"""

HIST_PROG = f"""
histogram cents_hist by type buckets 100, 400, 1600, 6400

/{LINE_RE.replace('/', chr(92) + '/')}/ {{
  strptime($dt, "2006-01-02T15:04:05")
  cents_hist[$type] = $cents
}}
"""

# The same rendering in both engines.  Cents via round(value*100) —
# identical IEEE doubles and half-away-from-zero on positives.
SPARK_RENDER = None  # built in render_lines

ORACLE_RENDER = (
    "SELECT event_id, user_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS dt, "
    "event_type, CAST(round(value * 100) AS BIGINT) AS cents, "
    "CAST(epoch_us(date_trunc('second', ts)) AS BIGINT) AS ts_us "
    "FROM events"
)


# Rendered-line relations memoized per (session, sf_dir): the nested
# format_string/date_format expression trees cost ~0.3 s of py4j
# construction per build, and returning the SAME DataFrame object lets
# CompiledProgram.run_batch's plan cache hit without re-deriving the
# input's semantic hash from a fresh analysis.
_RENDER_CACHE: dict = {}


def _memo_render(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(spark, sf_dir):
        from mtail_spark.session import session_token

        key = (fn.__name__, session_token(spark), sf_dir)
        df = _RENDER_CACHE.get(key)
        if df is None:
            if len(_RENDER_CACHE) >= 64:
                _RENDER_CACHE.clear()
            df = fn(spark, sf_dir)
            _RENDER_CACHE[key] = df
        return df

    return wrapper


@_memo_render
def render_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtail_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    # Repartition the RAW scan before the CPU-heavy projections
    # (date_format + concat) so they run cluster-wide; line_no comes
    # from event_id, so ordering survives the shuffle.
    from mtail_spark.session import ensure_parallelism

    ev = ensure_parallelism(ev, spark)
    line = F.concat_ws(
        " ",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.col("event_type"),
        F.concat(F.lit("user="), F.col("user_id").cast("string")),
        F.concat(
            F.lit("val="), F.round(F.col("value") * 100).cast("long").cast("string")
        ),
        F.col("props"),
    )
    return log_lines_from_df(
        ev.withColumn("line", line), "line", filename="events", order_col="event_id"
    )


def q_mtail_prog_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    prog = compile_program(COUNTER_PROG, "demo_counters.mtail")
    store = prog.run_batch(spark, render_lines(spark, sf_dir))
    return store.select(
        "name",
        F.coalesce(F.col("labels")["type"], F.lit("")).alias("type"),
        F.col("value_i"),
        F.col("ts_us"),
    )


def q_mtail_prog_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    prog = compile_program(GAUGE_PROG, "demo_gauge.mtail")
    store = prog.run_batch(spark, render_lines(spark, sf_dir))
    return store.select(
        F.col("labels")["type"].alias("type"),
        F.col("value_i").alias("last_cents"),
        F.col("ts_us"),
    )


def q_mtail_prog_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    prog = compile_program(HIST_PROG, "demo_hist.mtail")
    store = prog.run_batch(spark, render_lines(spark, sf_dir))
    return store.select(
        F.col("labels")["type"].alias("type"),
        F.col("bucket_count"),
        F.col("bucket_sum"),
        F.explode("buckets").alias("b"),
    ).select(
        "type",
        F.col("b.le").alias("le"),
        F.col("b.count").alias("n"),
        "bucket_count",
        "bucket_sum",
    )


STATEFUL_PROG = f"""
hidden gauge last_k by user
gauge k_delta by user

/{LINE_RE.replace('/', chr(92) + '/')}/ {{
  strptime($dt, "2006-01-02T15:04:05")
  k_delta[$user] = $cents - last_k[$user]
  last_k[$user] = $cents
}}
"""


def q_mtail_prog_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-line hidden-metric state, DIMENSIONED (the rsyncd
    pattern, one carry per label value): per-user delta between
    consecutive events, vectorized through the event-relation carry
    window (codegen.py).  The SQL oracle is a lag window — the
    relational dual of the DSL's mutable-state idiom."""
    prog = compile_program(STATEFUL_PROG, "demo_stateful.mtail")
    assert prog.checked.cross_line_state
    store = prog.run_batch(spark, render_lines(spark, sf_dir))
    return store.filter(F.col("name") == "k_delta").select(
        F.col("labels")["user"].alias("user"),
        F.col("value_i").alias("k_delta"),
        F.col("ts_us"),
    )


TXN_PROG = """
hidden text cur_user
hidden gauge pending
hidden gauge tmp_cents

counter cents_by_user by user
counter commits_total
counter skipped_commits

/^(?P<dt>\\S+) BEGIN user=(?P<user>\\d+)/ {
  strptime($dt, "2006-01-02T15:04:05")
  cur_user = $user
  pending = 1
  tmp_cents = 0
}

/^(?P<dt>\\S+) AMOUNT cents=(?P<cents>\\d+)/ {
  strptime($dt, "2006-01-02T15:04:05")
  tmp_cents = $cents
}

/^(?P<dt>\\S+) COMMIT/ {
  strptime($dt, "2006-01-02T15:04:05")
  pending == 1 {
    pending = 0
    cents_by_user[cur_user] += tmp_cents
    commits_total++
  } else {
    skipped_commits++
  }
}
"""


@_memo_render
def render_txn_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-line transaction records from the events table: BEGIN /
    AMOUNT / COMMIT per event, with the COMMIT dropped every 7th
    event (state leaks into the next record) and a spurious second
    COMMIT every 11th (hits the pending==0 else branch — unless the
    real COMMIT was the dropped one, in which case it salvages the
    record)."""
    from mtail_spark.session import ensure_parallelism, load_table

    ev = ensure_parallelism(load_table(spark, sf_dir, "events"), spark)
    dt = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    cents = F.round(F.col("value") * 100).cast("long").cast("string")
    eid = F.col("event_id")
    slots = F.array(
        F.concat(dt, F.lit(" BEGIN user="), F.col("user_id").cast("string")),
        F.concat(dt, F.lit(" AMOUNT cents="), cents),
        F.when(eid % 7 != 0, F.concat(dt, F.lit(" COMMIT"))),
        F.when(eid % 11 == 0, F.concat(dt, F.lit(" COMMIT"))),
    )
    lines = (
        ev.select("event_id", F.posexplode(slots).alias("slot", "line"))
        .filter(F.col("line").isNotNull())
        .withColumn("ord", eid * 4 + F.col("slot"))
    )
    return log_lines_from_df(
        lines, "line", filename="txns", order_col="ord"
    )


def q_mtail_prog_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-line hidden-metric state, SCALAR (the mysql_slowqueries
    pattern): keyless text/gauge registers resolved as stratified
    carry-window columns over the line relation, including the
    provably value-preserving pending==1 self-cycle relaxation and a
    register-read metric label (codegen.py _plan_registers /
    _relax_self_cycle).  The oracle replays the record algebra
    directly over events."""
    prog = compile_program(TXN_PROG, "demo_txn.mtail")
    assert prog.checked.cross_line_state
    store = prog.run_batch(spark, render_txn_lines(spark, sf_dir))
    return store.select(
        "name",
        F.coalesce(F.col("labels")["user"], F.lit("")).alias("user"),
        F.col("value_i"),
        F.col("ts_us"),
    )


# A COMMIT fires iff pending==1 when it runs: the slot-2 COMMIT always
# (its record's BEGIN precedes it), the slot-3 spurious COMMIT only
# when slot-2 was dropped (event_id%7==0).  Registers hold the current
# record's user/cents at both, so firing events contribute (user_id,
# cents) — the whole line machine collapses to event-level algebra.
ORACLE_TXN = f"""
WITH r AS ({ORACLE_RENDER}),
f AS (
  SELECT *,
         (event_id % 7 <> 0) OR (event_id % 11 = 0 AND event_id % 7 = 0)
           AS fires,
         (event_id % 11 = 0 AND event_id % 7 <> 0) AS skipped
  FROM r
)
SELECT 'cents_by_user' AS name, CAST(user_id AS VARCHAR) AS user,
       CAST(sum(cents) AS BIGINT) AS value_i,
       CAST(arg_max(ts_us, event_id) AS BIGINT) AS ts_us
FROM f WHERE fires GROUP BY user_id
UNION ALL
SELECT 'commits_total', '',
       (SELECT count(*) FROM f WHERE fires),
       (SELECT CAST(arg_max(ts_us, event_id) AS BIGINT)
        FROM f WHERE fires)
UNION ALL
SELECT 'skipped_commits', '',
       (SELECT count(*) FROM f WHERE skipped),
       (SELECT CAST(arg_max(ts_us, event_id) AS BIGINT)
        FROM f WHERE skipped)
"""


ORACLE_STATEFUL = f"""
WITH r AS ({ORACLE_RENDER}),
d AS (
  SELECT user_id, event_id, ts_us,
         CAST(cents - coalesce(
           lag(cents) OVER (PARTITION BY user_id ORDER BY event_id), 0)
         AS BIGINT) AS k_delta
  FROM r
)
SELECT CAST(user_id AS VARCHAR) AS user, k_delta, ts_us FROM (
  SELECT user_id, k_delta, ts_us,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
  FROM d
) WHERE rn = 1
"""


ORACLE_COUNTERS = f"""
WITH r AS ({ORACLE_RENDER}),
last AS (
  SELECT event_type, ts_us,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id DESC) rn
  FROM r
),
lastg AS (SELECT event_type, ts_us FROM last WHERE rn = 1),
lastall AS (
  SELECT ts_us FROM (
    SELECT ts_us, row_number() OVER (ORDER BY event_id DESC) rn FROM r
  ) WHERE rn = 1
)
SELECT 'events_total' AS name, '' AS type,
       (SELECT count(*) FROM r) AS value_i,
       (SELECT ts_us FROM lastall) AS ts_us
UNION ALL
SELECT 'by_type', event_type, count(*),
       (SELECT ts_us FROM lastg WHERE lastg.event_type = r.event_type)
FROM r GROUP BY event_type
UNION ALL
SELECT 'cents_total', event_type, CAST(sum(cents) AS BIGINT),
       (SELECT ts_us FROM lastg WHERE lastg.event_type = r.event_type)
FROM r GROUP BY event_type
"""

ORACLE_GAUGE = f"""
WITH r AS ({ORACLE_RENDER})
SELECT event_type AS type, cents AS last_cents, ts_us FROM (
  SELECT event_type, cents, ts_us,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id DESC) rn
  FROM r
) WHERE rn = 1
"""

ORACLE_HIST = f"""
WITH r AS ({ORACLE_RENDER}),
b AS (SELECT * FROM (VALUES (100.0), (400.0), (1600.0), (6400.0),
                     (CAST('Infinity' AS DOUBLE))) AS t(le)),
obs AS (
  SELECT event_type,
         CASE WHEN cents <= 100 THEN 100.0
              WHEN cents <= 400 THEN 400.0
              WHEN cents <= 1600 THEN 1600.0
              WHEN cents <= 6400 THEN 6400.0
              ELSE CAST('Infinity' AS DOUBLE) END AS le,
         cents
  FROM r
),
tot AS (
  SELECT event_type, count(*) AS bucket_count,
         CAST(sum(CAST(cents AS DOUBLE)) AS DOUBLE) AS bucket_sum
  FROM obs GROUP BY event_type
),
cnt AS (
  SELECT event_type, le, count(*) AS n FROM obs GROUP BY event_type, le
)
SELECT types.event_type AS type, b.le,
       CAST(coalesce(cnt.n, 0) AS BIGINT) AS n,
       tot.bucket_count, tot.bucket_sum
FROM (SELECT DISTINCT event_type FROM r) types
CROSS JOIN b
LEFT JOIN cnt ON cnt.event_type = types.event_type AND cnt.le = b.le
JOIN tot ON tot.event_type = types.event_type
"""


# ---------------------------------------------------------------- dhcpd
# The reference's heaviest example program (27 metric sites, syslog
# decorator, strptime "Jan _2 15:04:05") — its captured log is absent
# from the reference checkout, so input lines are RENDERED from the
# events table: scale tracks SF, message mix tracks event_type.
# Compiled from the reference source at runtime (read-only).  The full
# store — counts AND per-datum year-0 strptime timestamps — is
# hash-checked against ORACLE_DHCPD_FULL below (the rendering fully
# determines which of the 27 sites fire); cross-backend semantic
# coverage additionally lives in tests/test_backend_consistency.py.

DHCPD_PATH = "/root/reference/examples/dhcpd.mtail"


@_memo_render
def render_dhcpd_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtail_spark.session import ensure_parallelism, load_table

    ev = ensure_parallelism(load_table(spark, sf_dir, "events"), spark)
    eid = F.col("event_id")
    mac = F.format_string(
        "02:%02x:%02x:%02x:ef:34",
        (eid % 251).cast("int"),
        ((eid / F.lit(7)).cast("long") % 249).cast("int"),
        ((eid / F.lit(53)).cast("long") % 247).cast("int"),
    )
    ip = F.format_string(
        "10.0.%d.%d",
        ((eid / F.lit(256)).cast("long") % 256).cast("int"),
        (eid % 256).cast("int"),
    )
    msg = (
        F.when(F.col("event_type") == "purchase",
               F.format_string("DHCPACK on %s to %s via eth0", ip, mac))
        .when(F.col("event_type") == "view",
              F.format_string("DHCPOFFER on %s to %s via eth0", ip, mac))
        .when(F.col("event_type") == "error",
              F.format_string(
                  "DHCPDISCOVER from %s via eth1: network 10.1.0.0/16: "
                  "no free leases", mac))
        .when(F.col("event_type") == "click",
              F.format_string(
                  "DHCPREQUEST for %s (10.0.0.1) from %s via eth0",
                  ip, mac))
        .otherwise(
            F.format_string("DHCPDISCOVER from %s via eth0", mac))
    )
    # "Jan _2 15:04:05": month name, SPACE-padded day, wall time
    stamp = F.concat(
        F.date_format("ts", "MMM"), F.lit(" "),
        F.lpad(F.dayofmonth("ts").cast("string"), 2, " "), F.lit(" "),
        F.date_format("ts", "HH:mm:ss"),
    )
    line = F.concat(stamp, F.lit(" dhcp1 dhcpd[1234]: "), msg)
    return log_lines_from_df(
        ev.withColumn("line", line), "line",
        filename="dhcpd_synth", order_col="event_id",
    )


# dhcpd sites whose firing condition + labels the synthetic render
# determines exactly (plain counter sites over rendered fields), plus
# every zero-init scalar counter — the subset a SQL oracle can mirror.
# The remaining sites (mac/ip/network caprefs on message shapes the
# render never emits) stay covered by the rows-only full-program row.
DHCPD_CORE_METRICS = (
    "request_total",
    "dhcpdiscovers",
    "dhcpdiscover_nofree",
    "config_file_errors",
    "peer_disconnects",
    "bind_xid_mismatch",
    "duplicate_lease",
    "bad_udp_checksum",
    "unknown_subnet",
    "update_rejected",
    "failover_peer_timeout",
    "ip_already_in_use",
    "invalid_state_transition",
    "lease_conflicts",
)


# DuckDB mirror of the core slice.  The rendering (render_dhcpd_lines)
# fully determines which sites fire per event row:
#   command  : event_type -> first word of the message, lowercased
#   discover : error + otherwise event types render DHCPDISCOVER
#   nofree   : only the 'error' render carries ': no free leases'
#              with network 10.1.0.0/16
#   scalars  : never fire -> zero-init rows at value 0
# event_id // 7 etc. use floor division: Spark's (col / 7).cast(long)
# truncates toward zero and event_id >= 0.
_DHCPD_SCALARS = (
    "config_file_errors", "peer_disconnects", "bind_xid_mismatch",
    "duplicate_lease", "bad_udp_checksum", "unknown_subnet",
    "update_rejected", "failover_peer_timeout", "ip_already_in_use",
    "invalid_state_transition", "lease_conflicts",
)

ORACLE_DHCPD_CORE = f"""
    WITH ev AS (
      SELECT event_id,
             event_type,
             CASE event_type
               WHEN 'purchase' THEN 'dhcpack'
               WHEN 'view' THEN 'dhcpoffer'
               WHEN 'error' THEN 'dhcpdiscover'
               WHEN 'click' THEN 'dhcprequest'
               ELSE 'dhcpdiscover' END AS command,
             printf('02:%02x:%02x:%02x:ef:34',
                    event_id % 251,
                    (event_id // 7) % 249,
                    (event_id // 53) % 247) AS mac
      FROM events
    )
    SELECT 'request_total' AS name,
           '{{"command":"' || command || '"}}' AS labels_json,
           count(*) AS value_i
    FROM ev GROUP BY command
    UNION ALL
    SELECT 'dhcpdiscovers', '{{"mac":"' || mac || '"}}', count(*)
    FROM ev WHERE command = 'dhcpdiscover' GROUP BY mac
    UNION ALL
    SELECT 'dhcpdiscover_nofree', '{{"network":"10.1.0.0/16"}}', count(*)
    FROM ev WHERE event_type = 'error' HAVING count(*) > 0
    UNION ALL
    SELECT s, '{{}}', CAST(0 AS BIGINT)
    FROM (VALUES {", ".join(f"('{s}')" for s in _DHCPD_SCALARS)}) t(s)
"""


# Year-0 microseconds of the rendered syslog stamp, rebuilt in DuckDB:
# the dhcpd program's syslog decorator parses "Jan _2 15:04:05"
# (yearless -> year 0, reference internal/runtime/vm/vm.go strptime
# semantics), so each line's wall clock is the event's month/day/time
# transplanted onto year 0 — a NEGATIVE epoch.  make_timestamp(0, ...)
# and the engine's gotime agree bit-for-bit (both proleptic Gregorian).
_Y0_US = (
    "epoch_us(make_timestamp(0, month(ts), day(ts), hour(ts), "
    "minute(ts), CAST(date_part('second', ts) AS DOUBLE)))"
)

# FULL-program oracle (retires the suite's last mtail rows-only row):
# same firing model as the core oracle, PLUS the per-datum timestamp —
# within one file a counter datum's ts is the ts at its LAST update in
# line order (arg_max over event_id, the render's order column), and a
# never-updated scalar reconstructs epoch 0.  This makes the oracle
# exercise the strptime year-0 path, not just the counting.
ORACLE_DHCPD_FULL = f"""
    WITH ev AS (
      SELECT event_id,
             event_type,
             CASE event_type
               WHEN 'purchase' THEN 'dhcpack'
               WHEN 'view' THEN 'dhcpoffer'
               WHEN 'error' THEN 'dhcpdiscover'
               WHEN 'click' THEN 'dhcprequest'
               ELSE 'dhcpdiscover' END AS command,
             printf('02:%02x:%02x:%02x:ef:34',
                    event_id % 251,
                    (event_id // 7) % 249,
                    (event_id // 53) % 247) AS mac,
             {_Y0_US} AS y0_us
      FROM events
    )
    SELECT 'request_total' AS name,
           '{{"command":"' || command || '"}}' AS labels_json,
           count(*) AS value_i,
           arg_max(y0_us, event_id) AS ts_us
    FROM ev GROUP BY command
    UNION ALL
    SELECT 'dhcpdiscovers', '{{"mac":"' || mac || '"}}', count(*),
           arg_max(y0_us, event_id)
    FROM ev WHERE command = 'dhcpdiscover' GROUP BY mac
    UNION ALL
    SELECT 'dhcpdiscover_nofree', '{{"network":"10.1.0.0/16"}}', count(*),
           arg_max(y0_us, event_id)
    FROM ev WHERE event_type = 'error' HAVING count(*) > 0
    UNION ALL
    SELECT s, '{{}}', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM (VALUES {", ".join(f"('{s}')" for s in _DHCPD_SCALARS)}) t(s)
"""


def q_mtail_prog_dhcpd_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plain-counter slice of the dhcpd store: the full 27-site
    program runs unchanged; the returned rows are filtered to
    DHCPD_CORE_METRICS and the value column only, which the core
    DuckDB oracle rebuilds from the event rendering (command mapping,
    per-mac discover counts, no-free-leases network, scalar
    zero-inits).  Kept alongside the full oracle so a timestamp
    regression and a counting regression localize separately."""
    full = q_mtail_prog_dhcpd(spark, sf_dir)
    return full.filter(F.col("name").isin(*DHCPD_CORE_METRICS)).select(
        "name", "labels_json", "value_i"
    )


def q_mtail_prog_dhcpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    if not os.path.exists(DHCPD_PATH):
        raise FileNotFoundError(
            "reference checkout with examples/dhcpd.mtail required"
        )
    prog = compile_program(open(DHCPD_PATH).read(), "dhcpd.mtail")
    store = prog.run_batch(spark, render_dhcpd_lines(spark, sf_dir))
    return store.select(
        "name",
        F.coalesce(
            F.to_json("labels"), F.lit("{}")
        ).alias("labels_json"),
        "value_i",
        "ts_us",
    )
