"""Reader for mtail "golden" metric-store files.

Behavior port of the golden format parsed by
reference internal/mtail/golden/reader.go:20-156:

    kind name {k=v,...} value timestamp

- kind in counter|gauge|timer|text|histogram
- labels optional, comma-separated k=v (value `\"\"` means empty string)
- value typed by parse: int -> Int, float -> Float, else String
  (a parseable-but-zero float is treated as String by the reference
  reader; we keep Float-if-parses for sanity but mirror the 0.0 quirk)
- timestamp RFC3339 or integer nanoseconds since epoch
- a scalar (keyless) counter is zero-initialized at epoch 0 when first
  declared (reference golden/reader.go:106-118 + codegen.go:109-126)
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from mtail_spark.store import EPOCH, DatumRow

_LINE_RE = re.compile(
    r"^(counter|gauge|timer|text|histogram) ([^ ]+)"
    r"(?: \{([^}]+)\})?(?: (\S+))?(?: (.+))?"
)


def _parse_value(raw: str):
    """Returns (vtype, value) with the reference reader's typing rules."""
    try:
        return "Int", int(raw)
    except ValueError:
        pass
    try:
        f = float(raw)
        if f == 0.0:
            # reference golden/reader.go:75-79: zero floats fall through
            # to string ("0" parses as int first, so this only hits
            # literals like "0.0"; keep the quirk for parity).
            return "String", raw
        return "Float", f
    except ValueError:
        return "String", raw


def _parse_ts(raw: str) -> datetime | None:
    if not raw:
        return None
    try:
        return datetime.fromisoformat(raw.replace("Z", "+00:00")).astimezone(
            timezone.utc
        )
    except ValueError:
        pass
    try:
        ns = int(raw)
        return datetime.fromtimestamp(ns / 1e9, tz=timezone.utc)
    except ValueError:
        return None


def read_golden(path: str, prog: str) -> list[DatumRow]:
    rows: dict[tuple, DatumRow] = {}
    kinds: dict[str, tuple[str, str]] = {}  # name -> (kind, vtype)
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            m = _LINE_RE.match(line)
            if not m:
                continue
            kind, name, labelstr, valraw, tsraw = m.groups()
            labels = []
            if labelstr:
                for pair in labelstr.split(","):
                    k, _, v = pair.partition("=")
                    if v == '""':
                        v = ""
                    labels.append((k, v))
            labels = tuple(sorted(labels))
            if valraw is None or valraw == "":
                # declaration-only line
                if kind == "counter" and not labels and name not in kinds:
                    rows[(prog, name, ())] = DatumRow(
                        prog, name, kind, "Int", (), 0, EPOCH
                    )
                kinds.setdefault(name, (kind, "Int"))
                continue
            vtype, value = _parse_value(valraw)
            ts = _parse_ts(tsraw or "")
            if kind == "counter" and not labels and name not in kinds:
                pass  # value provided immediately; no zero-init needed
            kinds.setdefault(name, (kind, vtype))
            rows[(prog, name, labels)] = DatumRow(
                prog, name, kind, vtype, labels, value, ts
            )
    return list(rows.values())
