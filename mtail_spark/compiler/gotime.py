"""Go time-layout handling: proleptic-calendar epoch math (year 0 is
representable, matching Go's time model) and translation of Go
reference layouts ("2006-01-02 15:04:05") to Python strptime and Java
DateTimeFormatter patterns.

Reference behavior: internal/runtime/vm/vm.go:555-589 (strptime),
vm.go:309-332 (yearless handling), checker.go:802-829 (compile-time
layout validation).
"""

from __future__ import annotations

import re

US = 1_000_000


def days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01 for a proleptic Gregorian date; valid for
    any year incl. 0 and negatives (Hinnant's algorithm)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def civil_to_epoch_us(
    y: int, mo: int, d: int, h: int = 0, mi: int = 0, s: int = 0, us: int = 0
) -> int:
    return (
        days_from_civil(y, mo, d) * 86400 + h * 3600 + mi * 60 + s
    ) * US + us


# Offset (µs) to move a date parsed with default year Y back to year 0,
# split at March 1 to keep month/day alignment across leap days
# (year 0 is a proleptic leap year).
def year_shift_us(from_year: int, month: int) -> int:
    if month <= 2:
        return civil_to_epoch_us(from_year, 1, 1) - civil_to_epoch_us(0, 1, 1)
    return civil_to_epoch_us(from_year, 3, 1) - civil_to_epoch_us(0, 3, 1)


# Go layout tokens, longest-first.  Each maps to
# (python_strptime, java_pattern, field).
_TOKENS = [
    ("2006", "%Y", "yyyy", "year"),
    ("January", "%B", "MMMM", "month"),
    ("Monday", "%A", "EEEE", "weekday"),
    (".000000", ".%f", ".SSSSSS", "frac"),
    (".999999", ".%f", ".SSSSSS", "frac"),
    ("Jan", "%b", "MMM", "month"),
    ("Mon", "%a", "EEE", "weekday"),
    ("MST", "%Z", "zzz", "zone"),
    ("Z07:00", "%z", "XXX", "zone"),
    ("Z0700", "%z", "XX", "zone"),
    ("-07:00", "%z", "xxx", "zone"),
    ("-0700", "%z", "xx", "zone"),
    (".000", ".%f", ".SSS", "frac"),
    (".999", ".%f", ".SSS", "frac"),
    ("15", "%H", "HH", "hour24"),
    ("PM", "%p", "a", "ampm"),
    ("pm", "%p", "a", "ampm"),
    ("_2", "%d", "d", "day"),  # space-padded; normalized upstream
    ("06", "%y", "yy", "year2"),
    ("01", "%m", "MM", "month"),
    ("02", "%d", "dd", "day"),
    ("03", "%I", "hh", "hour12"),
    ("04", "%M", "mm", "minute"),
    ("05", "%S", "ss", "second"),
    ("1", "%m", "M", "month"),
    ("2", "%d", "d", "day"),
    ("3", "%I", "h", "hour12"),
    ("4", "%M", "m", "minute"),
    ("5", "%S", "s", "second"),
]


class LayoutError(ValueError):
    pass


def parse_layout(layout: str):
    """Tokenize a Go layout. Returns (tokens, fields) where tokens is a
    list of ('tok', entry) / ('lit', text)."""
    out = []
    fields = set()
    i = 0
    while i < len(layout):
        for tok, py, java, field in _TOKENS:
            if layout.startswith(tok, i):
                out.append(("tok", (tok, py, java, field)))
                fields.add(field)
                i += len(tok)
                break
        else:
            out.append(("lit", layout[i]))
            i += 1
    return out, fields


def to_python(layout: str) -> tuple[str, set]:
    toks, fields = parse_layout(layout)
    parts = []
    for kind, v in toks:
        if kind == "lit":
            parts.append(v.replace("%", "%%"))
        else:
            parts.append(v[1])
    return "".join(parts), fields


def to_java(layout: str) -> tuple[str, set]:
    toks, fields = parse_layout(layout)
    parts = []
    literal = ""

    def flush():
        nonlocal literal
        if literal:
            if re.search(r"[a-zA-Z']", literal):
                parts.append("'" + literal.replace("'", "''") + "'")
            else:
                parts.append(literal)
            literal = ""

    for kind, v in toks:
        if kind == "lit":
            literal += v
        else:
            flush()
            parts.append(v[2])
    flush()
    return "".join(parts), fields


def normalize_spaces(s: str) -> str:
    """Go's layouts use `_2` (space-padded) and double spaces; collapse
    runs of spaces so single-space patterns match."""
    return re.sub(r" +", " ", s)


def parse_go_time_us(
    value: str,
    layout: str,
    now_year: int | None = None,
    tz: str | None = None,
):
    """Parse `value` with a Go layout; returns epoch µs (UTC) or raises
    ValueError — matching Go time.Parse semantics for the fields the
    DSL corpus uses (year defaults to 0 when absent; yearless results
    are patched to now_year only when given, reference vm.go:309-332).

    tz: interpret a zone-LESS wall-clock in this IANA timezone instead
    of UTC (reference --override_timezone / time.ParseInLocation,
    vm.go:312-313).  An explicit zone in the layout always wins.  The
    zone offset is evaluated at the FINAL date (after any yearless
    patch, proxy year 1 for unpatched year-0 results) — DST rules
    then match the date the datum actually carries."""
    from datetime import datetime, timezone

    pyfmt, fields = to_python(layout)
    v = normalize_spaces(value.strip())
    f = normalize_spaces(pyfmt)
    # Python %z rejects some Go-accepted forms; normalize +NN:NN to +NNNN
    if "zone" in fields:
        v = re.sub(r"([+-]\d{2}):(\d{2})$", r"\1\2", v)
        f = f.replace("%z:%z", "%z")  # defensive; not expected
    dt = datetime.strptime(v, f)
    year = dt.year
    if "year" not in fields and "year2" not in fields:
        # Python defaulted to 1900; Go defaults to year 0.
        shift = year_shift_us(1900, dt.month)
        year = None
    else:
        shift = 0
    if dt.tzinfo is None:
        if tz:
            from zoneinfo import ZoneInfo

            if year is None:
                final_year = now_year if now_year is not None else 1
            else:
                final_year = max(year, 1)
            local = datetime(
                final_year, dt.month, dt.day, dt.hour, dt.minute,
                dt.second, dt.microsecond, tzinfo=ZoneInfo(tz),
            )
            dt = dt.replace(
                tzinfo=timezone(local.utcoffset())
            )
        else:
            dt = dt.replace(tzinfo=timezone.utc)
    base_us = civil_to_epoch_us(
        dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second, dt.microsecond
    ) - int(dt.utcoffset().total_seconds()) * US
    us = base_us - shift
    if year is None and now_year is not None:
        us += year_shift_us(now_year, dt.month) - 0
    return us


def epoch_us_year(us: int) -> int:
    """UTC calendar year of an epoch-µs instant (proleptic)."""
    from datetime import datetime, timezone

    return datetime.fromtimestamp(us / US, tz=timezone.utc).year


def format_epoch_us_rfc3339(us: int) -> str:
    """Render epoch µs as RFC3339 UTC, supporting year 0 (golden-file
    format, reference golden/reader.go)."""
    secs, rem = divmod(us, US)
    days, sod = divmod(secs, 86400)
    # invert days_from_civil
    z = days + 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + (3 if mp < 10 else -9)
    y += m <= 2
    h, rem2 = divmod(sod, 3600)
    mi, s = divmod(rem2, 60)
    frac = f".{rem:06d}".rstrip("0").rstrip(".") if rem else ""
    return f"{y:04d}-{m:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}{frac}Z"
