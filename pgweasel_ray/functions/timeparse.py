"""CLI time/interval parsing (operator M10).

Reference: /root/reference/src/util.rs:33-169 —
``time_or_interval_string_to_time`` accepts absolute timestamps (8 formats),
date-only, the keyword ``today``, and relative intervals where a POSITIVE
value means "that long ago" ("10m" → reference − 10 min) and an explicit
minus sign means the future ("-10m" → reference + 10 min; util.rs:99-105).
``d/day/days`` are converted to 24 h exactly (util.rs:91).

Divergences (documented, SURVEY §7.4):
- The reference resolves naive inputs in the machine's Local timezone; this
  engine is UTC-only — all returned timestamps are naive-UTC
  ``pandas.Timestamp``s, resolved BEFORE the job so every distributed task
  sees identical absolute bounds.
- Zone-suffixed stamps ("2025-05-02 18:25:51.151 EEST", the %Z formats of
  util.rs:120-129,180-183): chrono's %Z cannot be parsed into an offset, so
  the reference's DateTime::parse_from_str attempts fail and its naive
  fallback CONSUMES-AND-DISCARDS the zone name (the util.rs test vector
  only pins year/month). Here, recognized zone abbreviations CONVERT to
  UTC (a `-b 18:00 EEST` bound means the instant the user named); an
  unrecognized abbreviation is discarded exactly like the reference.
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
    # util.rs:122-129 (zone-suffixed inputs are handled separately below)
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%Y-%m-%dT%H:%M:%SZ",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
]

# UTC offsets (minutes) for the zone abbreviations PostgreSQL commonly logs
# (log_timezone names in %t/%m stamps). Fixed-offset table — abbreviations
# name an offset, not an IANA zone, so no DST rules are needed here.
TZ_OFFSET_MIN = {
    "UTC": 0, "GMT": 0, "Z": 0,
    "WET": 0, "WEST": 60, "BST": 60,
    "CET": 60, "CEST": 120,
    "EET": 120, "EEST": 180,
    "MSK": 180,
    "EST": -300, "EDT": -240,
    "CST": -360, "CDT": -300,
    "MST": -420, "MDT": -360,
    "PST": -480, "PDT": -420,
    "AKST": -540, "AKDT": -480,
    "HST": -600,
    "JST": 540, "KST": 540,
    "AEST": 600, "AEDT": 660,
    "NZST": 720, "NZDT": 780,
}

_TZ_SUFFIX_RE = re.compile(r"^(.+) ([A-Za-z]{1,5})$")


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

    ts = _parse_stamp(human_input)
    if ts is not None:
        return ts

    # zone-suffixed stamp (util.rs %Z formats): convert known abbreviations
    # to UTC, discard unknown ones (the reference's chrono fallback behavior)
    m = _TZ_SUFFIX_RE.match(human_input)
    if m:
        ts = _parse_stamp(m.group(1))
        if ts is not None:
            offset = TZ_OFFSET_MIN.get(m.group(2).upper())
            if offset is not None:
                return ts - pd.Timedelta(minutes=offset)
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


def _parse_stamp(s: str) -> pd.Timestamp | None:
    for fmt in _TIMESTAMP_FORMATS:
        try:
            ts = pd.Timestamp(pd.to_datetime(s, format=fmt))
        except (ValueError, TypeError):
            continue
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts
    return None
