"""CLI time/interval parsing (operator M10).

Reference: /root/reference/src/util.rs:33-169 —
``time_or_interval_string_to_time`` accepts absolute timestamps (8 formats),
date-only, the keyword ``today``, and relative intervals where a POSITIVE
value means "that long ago" ("10m" → reference − 10 min) and an explicit
minus sign means the future ("-10m" → reference + 10 min; util.rs:99-105).
``d/day/days`` are converted to 24 h exactly (util.rs:91).

Divergence (documented, SURVEY §7.4): the reference resolves naive inputs in
the machine's Local timezone; this engine is UTC-only — all returned
timestamps are naive-UTC ``pandas.Timestamp``s, resolved BEFORE the job so
every distributed task sees identical absolute bounds.
"""

from __future__ import annotations

import re

import pandas as pd

_INTERVAL_RE = re.compile(r"^(-?\d+)(ns|us|µs|ms|s|m|min|minutes|h|hours|d|day|days)$")

_UNIT_TO_TIMEDELTA = {
    "ns": "ns", "us": "us", "µs": "us", "ms": "ms", "s": "s",
    "m": "m", "min": "m", "minutes": "m", "h": "h", "hours": "h",
}

_TIMESTAMP_FORMATS = [
    # util.rs:120-129 (the %Z-suffixed ones parse the zone name and convert;
    # here zone names are accepted and treated as labels — fixtures are UTC)
    "%Y-%m-%d %H:%M:%S.%f %Z",
    "%Y-%m-%d %H:%M:%S %Z",
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%Y-%m-%dT%H:%M:%SZ",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
]


class TimeParseError(ValueError):
    pass


def parse_time_or_interval(
    human_input: str, reference_time: pd.Timestamp | None = None
) -> pd.Timestamp:
    if not human_input:
        raise TimeParseError("Empty input")
    if reference_time is None:
        reference_time = pd.Timestamp.utcnow().tz_localize(None)

    if human_input.lower() == "today":  # util.rs:48-53
        return reference_time.normalize()

    m = _INTERVAL_RE.match(human_input)
    if m:
        value, unit = int(m.group(1)), m.group(2)
        if unit in ("d", "day", "days"):
            delta = pd.Timedelta(hours=abs(value) * 24)  # util.rs:91
        else:
            delta = pd.Timedelta(abs(value), _UNIT_TO_TIMEDELTA[unit])
        # positive = past ("ago"), explicit '-' = future (util.rs:99-105)
        if human_input.startswith("-"):
            return reference_time + delta
        return reference_time - delta

    for fmt in _TIMESTAMP_FORMATS:
        try:
            ts = pd.Timestamp(pd.to_datetime(human_input, format=fmt))
        except (ValueError, TypeError):
            continue
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts

    # date-only (util.rs:155-164)
    if (
        len(human_input) == 10
        and human_input[4] == "-"
        and human_input[7] == "-"
    ):
        try:
            return pd.Timestamp(pd.to_datetime(human_input, format="%Y-%m-%d"))
        except (ValueError, TypeError):
            pass

    raise TimeParseError(
        f"Unsupported time delta / timestamp format: {human_input}"
    )
