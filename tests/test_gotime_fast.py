"""The compiled-layout fast path in gotime.parse_go_time_us must be
observationally identical to the datetime.strptime slow path — same
epoch, same accept/reject — across the corpus's layouts and a fuzz of
values.  (Reference semantics: internal/runtime/vm/vm.go:555-589.)"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mtail_spark.compiler import gotime as G


def _slow(value, layout, now_year=None, tz=None):
    """The pre-fast-path implementation, verbatim (strptime route)."""
    import re
    from datetime import datetime, timezone

    pyfmt, fields = G.to_python(layout)
    v = G.normalize_spaces(value.strip())
    f = G.normalize_spaces(pyfmt)
    if "zone" in fields:
        v = re.sub(r"([+-]\d{2}):(\d{2})$", r"\1\2", v)
        f = f.replace("%z:%z", "%z")
    dt = datetime.strptime(v, f)
    year = dt.year
    if "year" not in fields and "year2" not in fields:
        shift = G.year_shift_us(1900, dt.month)
        year = None
    else:
        shift = 0
    if dt.tzinfo is None:
        if tz:
            from zoneinfo import ZoneInfo

            final_year = (
                (now_year if now_year is not None else 1)
                if year is None
                else max(year, 1)
            )
            local = datetime(
                final_year, dt.month, dt.day, dt.hour, dt.minute,
                dt.second, dt.microsecond, tzinfo=ZoneInfo(tz),
            )
            dt = dt.replace(tzinfo=timezone(local.utcoffset()))
        else:
            dt = dt.replace(tzinfo=timezone.utc)
    base_us = G.civil_to_epoch_us(
        dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second,
        dt.microsecond,
    ) - int(dt.utcoffset().total_seconds()) * G.US
    us = base_us - shift
    if year is None and now_year is not None:
        us += G.year_shift_us(now_year, dt.month)
    return us


def _both(value, layout, now_year=None):
    try:
        want = _slow(value, layout, now_year)
    except ValueError:
        want = ValueError
    try:
        got = G.parse_go_time_us(value, layout, now_year)
    except ValueError:
        got = ValueError
    return want, got


NUMERIC_LAYOUTS = [
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05",
    "2006/01/02 15:04:05.000000",
    "01-02 15:04:05",
    "15:04:05",
    "060102 15:04:05",  # year2 with separator-free date kept slow
    "2006-1-2 15:4:5",
    "02/01/2006",
    "2006-01-02",
]


@pytest.mark.parametrize("layout", NUMERIC_LAYOUTS)
def test_valid_values_match_slow_path(layout):
    import random

    rng = random.Random(42)
    for _ in range(80):
        y, mo, d = rng.randint(1900, 2100), rng.randint(1, 12), rng.randint(1, 31)
        h, mi, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
        us = rng.randint(0, 999999)
        val = (
            layout.replace("2006", f"{y:04d}")
            .replace("01", f"{mo:02d}").replace("1", f"{mo}")
            .replace("02", f"{d:02d}").replace("2", f"{d}")
            .replace("15", f"{h:02d}")
            .replace("04", f"{mi:02d}").replace("4", f"{mi}")
            .replace("05", f"{s:02d}").replace("5", f"{s}")
            .replace(".000000", f".{us:06d}")
            .replace("06", f"{y % 100:02d}")
        )
        for ny in (None, 2024):
            want, got = _both(val, layout, ny)
            assert want == got, (layout, val, ny, want, got)


def test_fast_path_is_active_for_the_txn_layout():
    cl = G._layout("2006-01-02T15:04:05")
    assert cl.fast_re is not None
    assert cl.order == (
        "year", "month", "day", "hour24", "minute", "second"
    )


def test_ampm_and_zone_layouts_stay_slow():
    for layout in ("2006-01-02 15:04:05 -0700", "03:04:05 PM",
                   "2006-01-02T15:04:05Z07:00"):
        assert G._layout(layout).fast_re is None


def test_month_name_layouts_are_fast_and_match():
    """The syslog shape — THE serve-mode hot layout — takes the fast
    path and matches the strptime route on every month, padded and
    space-padded days, and case variants."""
    assert G._layout("Jan _2 15:04:05").fast_re is not None
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    for layout in ("Jan _2 15:04:05", "Jan 02 15:04:05",
                   "Mon Jan _2 15:04:05 2006",
                   "January 2, 2006 15:04:05"):
        for mi, mon in enumerate(months, 1):
            for d, rest in ((2, " 2"), (28, "28")):
                val = (layout
                       .replace("January", mon + "uary_FULL")
                       .replace("Jan", mon)
                       .replace("uary_FULL", "")
                       .replace("Mon", "Tue")
                       .replace("_2", rest).replace("02", f"{d:02d}")
                       .replace("2,", f"{d},")
                       .replace("2006", "2021")
                       .replace("15:04:05", "07:45:59"))
                if "January" in layout:
                    import calendar

                    val = val.replace(mon, calendar.month_name[mi])
                for v in (val, val.lower(), val.upper()):
                    want, got = _both(v, layout, 2024)
                    assert want == got, (layout, v, want, got)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="0123456789-T:. JanFebMrpyulgSOcNovDi",
        min_size=0,
        max_size=26,
    ),
    st.sampled_from(["Jan _2 15:04:05", "02/Jan/2006 15:04:05",
                     "Mon Jan _2 15:04:05 2006"]),
)
def test_fuzz_name_layout_values_match(value, layout):
    want, got = _both(value, layout)
    assert want == got, (layout, value, want, got)


def test_day_range_mirrors_datetime():
    # Feb 29 without a year: datetime's default 1900 is NOT a leap
    # year, so both paths must reject it
    assert _both("02-29 10:00:00", "01-02 15:04:05") == (
        ValueError, ValueError
    )
    assert _both("2024-02-29 10:00:00", "2006-01-02 15:04:05")[0] == \
        _both("2024-02-29 10:00:00", "2006-01-02 15:04:05")[1]
    assert _both("2023-02-29 10:00:00", "2006-01-02 15:04:05") == (
        ValueError, ValueError
    )
    assert _both("2024-04-31 10:00:00", "2006-01-02 15:04:05") == (
        ValueError, ValueError
    )


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="0123456789-T:. Z+abc",
        min_size=0,
        max_size=30,
    ),
    st.sampled_from(NUMERIC_LAYOUTS),
)
def test_fuzz_arbitrary_values_match(value, layout):
    want, got = _both(value, layout)
    assert want == got, (layout, value, want, got)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=3000),
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=0, max_value=24),
    st.integers(min_value=0, max_value=61),
    st.integers(min_value=0, max_value=61),
)
def test_fuzz_numeric_fields_match(y, mo, d, h, mi, s):
    val = f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}"
    want, got = _both(val, "2006-01-02T15:04:05")
    assert want == got, (val, want, got)


def test_yearless_now_year_patch_matches():
    for ny in (None, 1, 1999, 2024):
        want, got = _both("12-25 08:30:01", "01-02 15:04:05", ny)
        assert want == got == G.parse_go_time_us(
            "12-25 08:30:01", "01-02 15:04:05", ny
        )


def test_fast_eval_specialization_surface():
    """r12 optimization: the fast path's field extraction is a
    per-layout specialized closure (fast_eval) instead of
    dict(zip(order, groups)).  Pin its contract: present exactly when
    fast_re is, None-return on the day guard (caller falls through to
    strptime), and field math identical to the slow path on the most
    branch-heavy combination (yearless + month-name + frac)."""
    cl = G._layout("2006-01-02T15:04:05")
    assert cl.fast_re is not None and cl.fast_eval is not None
    slow_only = G._layout("03:04:05 PM")
    assert slow_only.fast_re is None and slow_only.fast_eval is None

    # day guard: Apr 31 matches the regex but must return None
    m = cl.fast_re.fullmatch("2024-04-31T10:00:00")
    assert m is not None
    assert cl.fast_eval(m.groups(), None) is None

    # yearless + month name + frac: closure equals the strptime path
    layout = "Jan _2 15:04:05.000000"
    for val in ("Feb  3 07:08:09.250000", "Dec 31 23:59:59.000001"):
        for ny in (None, 2023):
            want, got = _both(val, layout, ny)
            assert want == got, (val, ny, want, got)
