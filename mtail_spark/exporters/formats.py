"""Export formatters over the metric store.

Behavior ports of the reference's export surface
(reference internal/exporter/): prometheus text exposition with
cumulative histogram buckets (prometheus.go:31-99), varz
(varz.go:21-60), graphite (graphite.go:29-95), statsd
(statsd.go:27-43), collectd PUTVAL (collectd.go:33-50), and the JSON
store dump (json.go:17-31).

All formatters take the store as a list of rows (dicts / Row objects
with STORE_SCHEMA field names) — the store is aggregation output, so
driver-side formatting is the right altitude; nothing here touches
executor-scale data.
"""

from __future__ import annotations

import json as _json
import math
import re

from mtail_spark.compiler.interp import go_float_str


def _value_str(r) -> str:
    """Datum ValueString (reference datum/int.go:43, float.go:21,
    buckets.go:38 — buckets print their sum with %g)."""
    vt = r["vtype"]
    if vt == "Int":
        return str(r["value_i"])
    if vt == "Float":
        return go_float_str(r["value_f"])
    if vt == "Buckets":
        return go_float_str(r["bucket_sum"] or 0.0)
    return r["value_s"] or ""


def _time_str(r) -> str:
    """Datum TimeString: epoch seconds (reference datum/datum.go:45-47)."""
    ts = r["ts_us"]
    if ts is None:
        return "0"
    return str(ts * 1000 // 1_000_000_000)  # floor like Go int div of ns


def _labels(r) -> dict:
    return dict(r["labels"] or {})


def _no_hyphens(name: str) -> str:
    return name.replace("-", "_")


def _format_labels(name: str, labels: dict, ksep: str, sep: str, rep: str) -> str:
    """reference export.go:161-178."""
    if not labels:
        return name
    parts = []
    for k in sorted(labels):
        k1 = k.replace(ksep, rep).replace(sep, rep)
        v1 = str(labels[k]).replace(ksep, rep).replace(sep, rep)
        parts.append(f"{k1}{ksep}{v1}")
    return name + sep + sep.join(parts)


def _escape_label_value(v) -> str:
    """Prometheus exposition-format label-value escaping: backslash,
    double-quote and newline (the reference gets this from the
    prometheus client library's expfmt writer)."""
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
    )


_LABEL_NAME_RE = re.compile(r"[^a-zA-Z0-9_]")


def _sanitize_label_name(k: str) -> str:
    """Metric/label names must match [a-zA-Z_][a-zA-Z0-9_]*."""
    k = _LABEL_NAME_RE.sub("_", str(k))
    if not k or k[0].isdigit():
        k = "_" + k
    return k


def to_prometheus(
    rows, omit_prog_label: bool = False, emit_timestamps: bool = False
) -> str:
    """Prometheus text exposition; histograms become cumulative buckets
    (reference datum/datum.go:240-259 GetBucketsCumByMax)."""
    out = []
    seen_types = set()
    ptype = {"counter": "counter", "gauge": "gauge", "timer": "gauge",
             "histogram": "histogram"}
    for r in rows:
        kind = r["kind"]
        if kind == "text":
            continue  # no prometheus representation (prometheus.go:38-42)
        name = _no_hyphens(r["name"])
        if name not in seen_types:
            out.append(f"# TYPE {name} {ptype.get(kind, 'untyped')}")
            seen_types.add(name)
        labels = _labels(r)
        if not omit_prog_label:
            labels = {"prog": r["prog"], **labels}
        stamp = ""
        if emit_timestamps and r["ts_us"] is not None:
            stamp = f" {r['ts_us'] // 1000}"  # milliseconds

        def render(nm, lbl, val):
            if lbl:
                body = ",".join(
                    f'{_sanitize_label_name(k)}="{_escape_label_value(v)}"'
                    for k, v in sorted(lbl.items())
                )
                return f"{nm}{{{body}}} {val}{stamp}"
            return f"{nm} {val}{stamp}"

        if kind == "histogram":
            cum = 0
            for b in r["buckets"] or []:
                cum += b["count"]
                le = "+Inf" if math.isinf(b["le"]) else go_float_str(b["le"])
                out.append(render(name + "_bucket", {**labels, "le": le}, cum))
            out.append(render(name + "_sum", labels,
                              go_float_str(r["bucket_sum"] or 0.0)))
            out.append(render(name + "_count", labels, r["bucket_count"] or 0))
        else:
            out.append(render(name, labels, _value_str(r)))
    return "\n".join(out) + "\n"


def to_varz(rows, hostname: str = "localhost",
            omit_prog_label: bool = False) -> str:
    """`name{k=v,...} value` (reference varz.go:18, 46-60)."""
    out = []
    for r in rows:
        parts = [f"{k}={v}" for k, v in _labels(r).items()]
        parts.sort()
        if not omit_prog_label:
            parts.append(f"prog={r['prog']}")
        parts.append(f"instance={hostname}")
        out.append(f"{r['name']}{{{','.join(parts)}}} {_value_str(r)}")
    return "\n".join(out) + "\n"


def to_graphite(rows, prefix: str = "") -> str:
    """`prefix prog.name.k.v value ts` with histogram bins
    (reference graphite.go:55-95)."""
    out = []
    for r in rows:
        path = _format_labels(r["name"], _labels(r), ".", ".", "_")
        ts = _time_str(r)
        if r["kind"] == "histogram" and r["vtype"] == "Buckets":
            for b in r["buckets"] or []:
                bin_name = "inf" if math.isinf(b["le"]) else go_float_str(b["le"])
                out.append(
                    f"{prefix}{r['prog']}.{path}.bin_{bin_name} "
                    f"{b['count']} {ts}"
                )
            out.append(
                f"{prefix}{r['prog']}.{path}.count "
                f"{r['bucket_count'] or 0} {ts}"
            )
        out.append(f"{prefix}{r['prog']}.{path} {_value_str(r)} {ts}")
    return "\n".join(out) + "\n"


def to_statsd(rows, prefix: str = "") -> str:
    """`prefix prog.name.k.v:value|c/g/ms` (reference statsd.go:27-43)."""
    tmap = {"counter": "c", "gauge": "g", "timer": "ms"}
    out = []
    for r in rows:
        if r["kind"] not in tmap:
            continue
        path = _format_labels(r["name"], _labels(r), ".", ".", "_")
        out.append(f"{prefix}{r['prog']}.{path}:{_value_str(r)}|{tmap[r['kind']]}")
    return "\n".join(out) + "\n"


def to_collectd(rows, hostname: str = "localhost", interval: int = 60,
                prefix: str = "mtail") -> str:
    """PUTVAL lines (reference collectd.go:33-50)."""
    out = []
    for r in rows:
        if r["vtype"] == "Buckets":
            continue
        path = _format_labels(r["name"], _labels(r), "-", "-", "_")
        dstype = "COUNTER" if r["kind"] == "counter" else "GAUGE"
        out.append(
            f"PUTVAL \"{hostname}/{prefix}-prog_{r['prog']}/"
            f"{dstype.lower()}-{path}\" interval={interval} "
            f"{_time_str(r)}:{_value_str(r)}"
        )
    return "\n".join(out) + "\n"


def to_json(rows) -> str:
    """Whole-store JSON dump grouped by metric name
    (reference json.go:17-31, marshaling the Metric structure)."""
    metrics: dict = {}
    for r in rows:
        m = metrics.setdefault(
            (r["name"], r["prog"]),
            {
                "Name": r["name"],
                "Program": r["prog"],
                "Kind": r["kind"],
                "Type": r["vtype"],
                "Keys": sorted((r["labels"] or {}).keys()),
                "LabelValues": [],
            },
        )
        if r["vtype"] == "Int":
            value = r["value_i"]
        elif r["vtype"] == "Float":
            value = r["value_f"]
        elif r["vtype"] == "Buckets":
            value = {
                "Buckets": [
                    {"Max": ("+Inf" if math.isinf(b["le"]) else b["le"]),
                     "Count": b["count"]}
                    for b in r["buckets"] or []
                ],
                "Count": r["bucket_count"],
                "Sum": r["bucket_sum"],
            }
        else:
            value = r["value_s"]
        m["LabelValues"].append(
            {
                "Labels": dict(r["labels"] or {}) or None,
                "Value": value,
                "Time": (r["ts_us"] * 1000) if r["ts_us"] is not None else 0,
            }
        )
    return _json.dumps(
        [metrics[k] for k in sorted(metrics)], indent=1, sort_keys=True
    )
