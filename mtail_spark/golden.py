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

from mtail_spark.compiler.gotime import civil_to_epoch_us
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


_RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?"
    r"(Z|[+-]\d{2}:?\d{2})$"
)


def _parse_ts(raw: str) -> int | None:
    """RFC3339 (year 0000 allowed) or integer nanoseconds -> epoch µs."""
    if not raw:
        return None
    m = _RFC3339_RE.match(raw)
    if m:
        y, mo, d, h, mi, s = (int(m.group(i)) for i in range(1, 7))
        frac = m.group(7) or ""
        us = int((frac + "000000")[:6]) if frac else 0
        val = civil_to_epoch_us(y, mo, d, h, mi, s, us)
        z = m.group(8)
        if z != "Z":
            sign = 1 if z[0] == "+" else -1
            zh, zm = int(z[1:3]), int(z[-2:])
            val -= sign * (zh * 3600 + zm * 60) * 1_000_000
        return val
    try:
        return int(raw) // 1000
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
