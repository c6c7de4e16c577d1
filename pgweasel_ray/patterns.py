"""Single source of truth for every extraction pattern in the engine.

All patterns are RE2-compatible and are used verbatim BOTH by the vectorized
pyarrow kernels (``pgweasel_ray.kernels``) and by the DuckDB oracle SQL
(``__ray_entry__.oracle_sql``) — pyarrow.compute and DuckDB both embed RE2, so
sharing the literal pattern string makes Ray-vs-oracle parity hold by
construction.

Semantics are needle-for-needle copies of the reference byte scanners:

- message: first ``": "`` in the record, spaces after the colon skipped,
  truncated at the first newline — /root/reference/src/format/plain.rs:2-23.
- duration: ``duration:`` + spaces + ``[0-9.]+`` + spaces + alphabetic unit
  run — /root/reference/src/duration.rs:5-41. Unit table duration.rs:43-54.
  KNOWN DIVERGENCE: the reference inspects only the FIRST ``duration:``
  occurrence and yields None if no digits follow it; RE2 has no lookahead, so
  we match the first occurrence *that is followed by digits*. Differs only on
  records like ``"duration: oops ... duration: 5 ms"``.
- key=value: bytes after ``host=``/``user=``/``database=``/
  ``application_name=``, where the FIRST character is taken unconditionally
  and the run then extends over every byte that is not space/comma/dquote —
  /root/reference/src/format/mod.rs:53-68 (note ``end = start + 1`` before
  the terminator loop: that is the unconditional first char). ``(?s)`` makes
  ``.`` match a newline first char, as the byte scanner does.
  KNOWN DIVERGENCE: a needle at the very end of the record panics in the
  reference (slice out of bounds); we return null.
- csv field 14 (kernels._CSV_F14_PATTERN): fields are either fully quoted
  (doubled quotes stay doubled) or quote-free runs — csv.rs:1-53.
  KNOWN DIVERGENCE: the reference's stateful quote-TOGGLING scanner
  (csv.rs:7-44) tolerates a malformed field containing an unpaired
  mid-field quote (e.g. ``ab"cd``) and returns a field slice; the regex
  alternation does not match such malformed rows and yields a null
  message. Differs only on CSV rows that violate the csvlog quoting rules.
- locking: 17 case-insensitive literals OR the case-SENSITIVE
  ``process [0-9]+ acquired`` scanner —
  /root/reference/src/filters/locking_filter.rs:12-30,51-83.
- system: ~24 case-insensitive literals —
  /root/reference/src/filters/system_filter.rs:12-43.
"""

from __future__ import annotations

import re

# --- message (plain format) -------------------------------------------------
# plain.rs:2-23: first ':' immediately followed by ' '; skip spaces; stop at \n.
MESSAGE_PATTERN = r": +(?P<m>[^\n]*)"

# --- duration ----------------------------------------------------------------
# duration.rs:5-41. Only ' ' (0x20) counts as skippable whitespace.
DURATION_PATTERN = r"duration: *(?P<v>[0-9.]+) *(?P<u>[A-Za-z]*)"

# unit → milliseconds conversion, duration.rs:43-54. ns/us go through
# ``v as u64`` (truncation toward zero) before scaling; ms/s/m stay float.
DURATION_UNIT_TO_MS = {
    "ns": ("trunc", 1e-6),
    "us": ("trunc", 1e-3),
    "ms": ("float", 1.0),
    "s": ("float", 1000.0),
    "m": ("float", 60000.0),
    "min": ("float", 60000.0),
    "minutes": ("float", 60000.0),
}

# --- key=value ---------------------------------------------------------------
# format/mod.rs:37-49 (needles) + 53-68 (scanner).
KV_NEEDLES = {
    "host": "host=",
    "user": "user=",
    "db": "database=",
    "appname": "application_name=",
}


def kv_pattern(needle: str) -> str:
    return r"(?s)" + re.escape(needle) + r'(?P<v>.[^ ,"]*)'


KV_PATTERNS = {col: kv_pattern(needle) for col, needle in KV_NEEDLES.items()}

# --- locking filter ----------------------------------------------------------
# locking_filter.rs:12-30 — case-insensitive Aho-Corasick literals.
LOCKING_NEEDLES = [
    " conflicts ",
    " conflicting ",
    " still waiting for ",
    "Wait queue:",
    "while locking tuple",
    "while updating tuple",
    "conflict detected",
    "deadlock detected",
    "buffer deadlock",
    "blocked by process ",
    "recovery conflict ",
    " concurrent update",
    "could not serialize",
    "could not obtain ",
    "lock on relation ",
    "cannot lock rows",
    " semaphore:",
]

# locking_filter.rs:51-83 — ``process [0-9]+ acquired`` is case-SENSITIVE
# (byte comparison), unlike the needle automaton.
PROCESS_ACQUIRED_PATTERN = r"process [0-9]+ acquired"

LOCKING_PATTERN = (
    "(?i:" + "|".join(re.escape(n) for n in LOCKING_NEEDLES) + ")"
    "|" + PROCESS_ACQUIRED_PATTERN
)

# --- system filter -----------------------------------------------------------
# system_filter.rs:12-43 — case-insensitive literals (list kept verbatim,
# including entries subsumed by shorter ones like "wal"/"replication").
SYSTEM_NEEDLES = [
    "autovacuum",
    "checkpointer",
    "background writer",
    "bgwriter",
    "wal",
    "replication",
    "logical replication",
    "replication slot",
    "walreceiver",
    "walsender",
    "archiver",
    "starting PostgreSQL",
    "database system is starting",
    "database system is ready",
    "database system is shutting down",
    "startup process",
    "shut down",
    "listening on ",
    "reloading configuration",
    "configuration file",
    "SIGHUP",
    "extension",
    "shared_preload_libraries",
    "CREATE EXTENSION",
]

SYSTEM_PATTERN = "(?i:" + "|".join(re.escape(n) for n in SYSTEM_NEEDLES) + ")"

# --- connection events -------------------------------------------------------
# connections.rs:51-102.
CONN_RECEIVED_PREFIX = "connection received:"
CONN_AUTHORIZED_PREFIX = "connection authorized:"
DISCONNECTION_PREFIX = "disconnection:"  # our extension; not counted by A4
SSL_NEEDLE = "SSL enabled"  # searched in the MESSAGE, connections.rs:81
AUTH_FAILURE_NEEDLES = [  # searched in the RECORD, connections.rs:52-53
    "password authentication failed",
    "is not permitted to log in",
]

# --- SQLSTATE-like codes (our addition, per north_star) ----------------------
# First parenthesized 5-char upper-alnum token, echoing csvlog's SQLSTATE
# column (e.g. ``ERROR:  ... (23503)``; cf. reference tests/files/csvlog1.csv).
SQLSTATE_PATTERN = r"\((?P<c>[0-9A-Z]{5})\)"
