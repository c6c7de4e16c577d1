"""Severity model — 12-level PostgreSQL severity with pgweasel's exact semantics.

Reference: /root/reference/src/severity.rs
  - needle check order (``from_log_string``): severity.rs:62-101 — the FIRST
    needle in this fixed order that occurs ANYWHERE in the record wins
    (e.g. a record containing both ``LOG:`` and ``ERROR:`` is Log, because
    LOG is checked first); default when nothing matches is Log
    (severity.rs:99).
  - integer rank (total order used by the min-severity filter):
    severity.rs:161-176 — Debug4=1 … Fatal=9, Log==Info==5,
    Debug5==Panic==0 (out-of-band low).
  - CLI string → severity (case-insensitive, unknown → Info):
    severity.rs:179-196.
"""

from __future__ import annotations

# Check order matters and is NOT rank order — copied from severity.rs:62-101.
# (needle, canonical lowercase name)
PLAIN_NEEDLES: list[tuple[str, str]] = [
    ("LOG:", "log"),
    ("ERROR:", "error"),
    ("INFO:", "info"),
    ("NOTICE:", "notice"),
    ("WARNING:", "warning"),
    ("DEBUG5:", "debug5"),
    ("DEBUG4:", "debug4"),
    ("DEBUG3:", "debug3"),
    ("DEBUG2:", "debug2"),
    ("DEBUG1:", "debug1"),
    ("FATAL:", "fatal"),
    ("PANIC:", "panic"),
]

# CSV variant wraps the tag in commas (severity.rs:20-58); same order.
CSV_NEEDLES: list[tuple[str, str]] = [
    (f",{needle[:-1]},", name) for needle, name in PLAIN_NEEDLES
]

DEFAULT_SEVERITY = "log"  # severity.rs:99

# severity.rs:161-176
RANK: dict[str, int] = {
    "debug5": 0,
    "debug4": 1,
    "debug3": 2,
    "debug2": 3,
    "debug1": 4,
    "log": 5,
    "info": 5,
    "notice": 6,
    "warning": 7,
    "error": 8,
    "fatal": 9,
    "panic": 0,
}

SEVERITY_NAMES = [name for _, name in PLAIN_NEEDLES]


def rank_of(name: str) -> int:
    return RANK[name]


def severity_from_cli(value: str) -> str:
    """CLI ``--level`` parsing: case-insensitive, unknown → info.

    Mirrors ``impl From<String> for Severity`` (severity.rs:179-196); note the
    reference maps unknown strings (including "info"!) to Info.
    """
    v = value.upper()
    table = {
        "DEBUG5": "debug5",
        "DEBUG4": "debug4",
        "DEBUG3": "debug3",
        "DEBUG2": "debug2",
        "DEBUG1": "debug1",
        "LOG": "log",
        "NOTICE": "notice",
        "WARNING": "warning",
        "ERROR": "error",
        "FATAL": "fatal",
        "PANIC": "panic",
    }
    return table.get(v, "info")
