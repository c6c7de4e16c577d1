"""Vectorized extraction kernels over Arrow arrays.

Each kernel is the columnar equivalent of one of pgweasel's per-record byte
scanners (citations inline; patterns shared with the DuckDB oracle via
``pgweasel_ray.patterns``). They take a ``pyarrow.Array`` of record text and
return Arrow arrays — no Python loop over rows, no Ray dependency, so they are
unit-testable standalone and run zero-copy inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import patterns, severity as sev


def _as_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _bool_np(arr: pa.Array) -> np.ndarray:
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)


# --- severity ----------------------------------------------------------------

def severity_columns(text: pa.Array, fmt: str = "plain") -> tuple[pa.Array, pa.Array]:
    """(severity name, severity rank) per record.

    Substring needles checked in the reference's fixed order — first match
    wins, independent of position in the record; default "log"/5.
    severity.rs:62-101 (plain needles ``ERROR:``) / severity.rs:20-58 (csv
    needles ``,ERROR,``); ranks severity.rs:161-176.
    """
    text = _as_array(text)
    needles = sev.CSV_NEEDLES if fmt == "csv" else sev.PLAIN_NEEDLES
    conds = [
        _bool_np(pc.match_substring(text, needle)) for needle, _ in needles
    ]
    names = [name for _, name in needles]
    ranks = [sev.RANK[name] for _, name in needles]
    name_arr = np.select(conds, names, default=sev.DEFAULT_SEVERITY)
    rank_arr = np.select(conds, ranks, default=sev.RANK[sev.DEFAULT_SEVERITY])
    return (
        pa.array(name_arr, type=pa.string()),
        pa.array(rank_arr.astype(np.int32), type=pa.int32()),
    )


# --- message -----------------------------------------------------------------

def message_column(text: pa.Array, fmt: str = "plain") -> pa.Array:
    """Plain: text after the first ``": "``, spaces skipped, truncated at
    first newline; null when no ``": "`` exists (plain.rs:2-23). Csv:
    1-based field 14 of the quote-aware CSV record, outer quotes stripped
    but escaped quotes left doubled (csv.rs:1-53)."""
    text = _as_array(text)
    if fmt == "csv":
        return _csv_message_column(text)
    ext = pc.extract_regex(text, patterns.MESSAGE_PATTERN)
    return pc.struct_field(ext, "m")


# field := quoted ("" escapes stay doubled — csv.rs:47-53 strips only the
# outer quotes) | run of non-comma/quote bytes; 13 fields+commas, then
# capture field 14.
_CSV_FIELD = r'(?:"(?:[^"]|"")*"|[^,"]*)'
_CSV_F14_PATTERN = (
    "^" + (_CSV_FIELD + ",") * 13 + "(?P<m>" + _CSV_FIELD + ")"
)


def _csv_message_column(text: pa.Array) -> pa.Array:
    ext = pc.extract_regex(text, _CSV_F14_PATTERN)
    raw = pc.struct_field(ext, "m")
    # strip the OUTER quote pair only (csv.rs:47-53) — vectorized RE2
    # rewrite; (?s) so embedded newlines inside a quoted field stay; a
    # 1-char field `"` cannot match (the pattern needs both quotes)
    return pc.replace_substring_regex(
        raw, pattern=r'^"((?s:.*))"$', replacement=r"\1"
    )


# --- duration ----------------------------------------------------------------

def duration_ms_column(text: pa.Array) -> pa.Array:
    """Extracted ``duration:`` value in milliseconds (float64, null when
    absent/unparseable/unknown unit). duration.rs:5-54; ns/us truncate the
    raw value to integer first (``v as u64``)."""
    text = _as_array(text)
    ext = pc.extract_regex(text, patterns.DURATION_PATTERN)
    v = pc.struct_field(ext, "v").to_numpy(zero_copy_only=False)
    u = pc.struct_field(ext, "u").to_numpy(zero_copy_only=False)
    val = pd.to_numeric(pd.Series(v, dtype=object), errors="coerce").to_numpy(
        dtype=np.float64
    )
    u = np.asarray(u, dtype=object)
    conds, choices = [], []
    for unit, (mode, scale) in patterns.DURATION_UNIT_TO_MS.items():
        conds.append(u == unit)
        base = np.floor(val) if mode == "trunc" else val
        choices.append(base * scale)
    ms = np.select(conds, choices, default=np.nan)
    return pa.array(ms, type=pa.float64(), mask=np.isnan(ms))


# --- key=value ---------------------------------------------------------------

def kv_column(text: pa.Array, field: str) -> pa.Array:
    """host/user/db/appname after its needle; first char unconditional, then
    a run of non-space/comma/dquote bytes. format/mod.rs:37-68."""
    text = _as_array(text)
    ext = pc.extract_regex(text, patterns.KV_PATTERNS[field])
    return pc.struct_field(ext, "v")


# --- sqlstate ----------------------------------------------------------------

# csvlog field 13 (1-based) IS PostgreSQL's sql_state_code column
# (runtime-config-logging docs); 12 fields+commas, then the bare 5-char
# code (never quoted). The reference itself never reads it (csv.rs only
# extracts field 14) — exact csv SQLSTATE is a documented improvement.
_CSV_F13_PATTERN = (
    "^" + (_CSV_FIELD + ",") * 12 + r"(?P<c>[0-9A-Z]{5}),"
)


def sqlstate_column(text: pa.Array, fmt: str = "plain") -> pa.Array:
    """Plain: first parenthesized 5-char upper-alnum token (our in-text
    convention, patterns.py). Csv: the real sql_state_code column."""
    text = _as_array(text)
    pattern = _CSV_F13_PATTERN if fmt == "csv" else patterns.SQLSTATE_PATTERN
    ext = pc.extract_regex(text, pattern)
    return pc.struct_field(ext, "c")


# --- filters -----------------------------------------------------------------

def locking_mask(text: pa.Array) -> pa.Array:
    """LockingFilter: 17 case-insensitive needles OR case-sensitive
    ``process [0-9]+ acquired``. locking_filter.rs:12-83."""
    return pc.fill_null(
        pc.match_substring_regex(_as_array(text), patterns.LOCKING_PATTERN), False
    )


def system_mask(text: pa.Array) -> pa.Array:
    """SystemFilter needles. system_filter.rs:12-57."""
    return pc.fill_null(
        pc.match_substring_regex(_as_array(text), patterns.SYSTEM_PATTERN), False
    )


def contains_mask(text: pa.Array, substring: str) -> pa.Array:
    """FilterContains / --mask: plain substring. filter_contains.rs:14-18."""
    return pc.fill_null(pc.match_substring(_as_array(text), substring), False)


# --- connection events -------------------------------------------------------

def event_columns(
    text: pa.Array, severity_name: pa.Array, message: pa.Array
) -> tuple[pa.Array, pa.Array]:
    """(event, ssl) per record, with ConnectionsAggregator's exact rules
    (connections.rs:51-102):

    - ``auth_failure``: severity == fatal AND the RECORD contains one of the
      failure needles (checked first, before the Log gate);
    - ``received`` / ``authorized``: severity == log (the enum value, so
      INFO does not count despite equal rank) AND the MESSAGE starts with the
      prefix; ssl = authorized AND message contains "SSL enabled";
    - ``disconnection``: our extension (same Log gate + prefix), not counted
      by the reference's aggregator;
    - a null message yields a null event on the received/authorized/
      disconnection branches; the fatal auth-failure branch matches on the
      RECORD and deliberately does NOT require an extractable message —
      the reference would have aborted the entire run on such a row
      (NotAbleToExtractMessage, before any branch), so any non-aborting
      choice is a divergence and this one keeps the failure count faithful.
      The DuckDB oracle encodes the same rule.
    """
    text = _as_array(text)
    severity_name = _as_array(severity_name)
    message = _as_array(message)
    n = len(text)

    is_fatal = _bool_np(pc.equal(severity_name, "fatal"))
    fail = np.zeros(n, dtype=bool)
    for needle in patterns.AUTH_FAILURE_NEEDLES:
        fail |= _bool_np(pc.match_substring(text, needle))
    failure = is_fatal & fail

    is_log = _bool_np(pc.equal(severity_name, "log"))
    has_msg = _bool_np(pc.is_valid(message))
    received = is_log & has_msg & _bool_np(
        pc.starts_with(message, patterns.CONN_RECEIVED_PREFIX)
    )
    authorized = is_log & has_msg & _bool_np(
        pc.starts_with(message, patterns.CONN_AUTHORIZED_PREFIX)
    )
    disconnection = is_log & has_msg & _bool_np(
        pc.starts_with(message, patterns.DISCONNECTION_PREFIX)
    )

    event = np.full(n, None, dtype=object)
    # order mirrors connections.rs: the fatal branch returns before the rest.
    event[disconnection] = "disconnection"
    event[authorized] = "authorized"
    event[received] = "received"
    event[failure] = "auth_failure"

    ssl = authorized & _bool_np(pc.match_substring(message, patterns.SSL_NEEDLE))
    return pa.array(event, type=pa.string()), pa.array(ssl, type=pa.bool_())


# --- full parse --------------------------------------------------------------

# field-group name → columns it adds
PARSE_GROUPS = {
    "severity": ("severity", "severity_rank"),
    "message": ("message",),
    "duration": ("duration_ms",),
    "kv": ("host", "user", "db", "appname"),
    "event": ("event", "ssl"),
    "sqlstate": ("sqlstate",),
    "locks": ("is_lock",),
    "system": ("is_system",),
}


def parse_table(
    batch: pa.Table,
    text_col: str = "text",
    groups: tuple[str, ...] | None = None,
    fmt: str = "plain",
) -> pa.Table:
    """Append the parsed columns for the requested field groups to ``batch``.

    This is the body of the parse ``map_batches`` stage; ``groups=None``
    computes everything. Column pruning happens upstream (the caller only
    reads the input columns it needs) — here we only control which derived
    columns are computed, so a histogram pipeline does not pay for kv
    extraction.

    ``fmt``: "plain" (default), "csv", or "auto" — auto splits the batch on
    the ``tool`` column ("csv" rows use the csv severity/message kernels;
    everything else plain), which is how raw-log-ingested datasets carry the
    reference's per-file Format (format/mod.rs:12-21). Severity, message
    and sqlstate are format-sensitive; duration/kv/filters scan the whole
    record in both formats (duration.rs:5, format/mod.rs:53, filters/*).
    """
    groups = tuple(PARSE_GROUPS) if groups is None else groups
    if fmt == "auto" and "tool" in batch.column_names:
        is_csv = pc.fill_null(pc.equal(batch["tool"], "csv"), False)
        if pc.any(is_csv).as_py():
            csv_part = parse_table(batch.filter(is_csv), text_col, groups, "csv")
            plain_part = parse_table(
                batch.filter(pc.invert(is_csv)), text_col, groups, "plain"
            )
            return pa.concat_tables([plain_part, csv_part])
        fmt = "plain"
    elif fmt == "auto":
        fmt = "plain"
    text = _as_array(batch[text_col])
    cols: dict[str, pa.Array] = {}
    need_event = "event" in groups
    if "severity" in groups or need_event:
        severity_name, rank = severity_columns(text, fmt)
        if "severity" in groups:
            cols["severity"] = severity_name
            cols["severity_rank"] = rank
    if "message" in groups or need_event:
        message = message_column(text, fmt)
        if "message" in groups:
            cols["message"] = message
    if "duration" in groups:
        cols["duration_ms"] = duration_ms_column(text)
    if "kv" in groups:
        for field in ("host", "user", "db", "appname"):
            cols[field] = kv_column(text, field)
    if need_event:
        cols["event"], cols["ssl"] = event_columns(text, severity_name, message)
    if "sqlstate" in groups:
        cols["sqlstate"] = sqlstate_column(text, fmt)
    if "locks" in groups:
        cols["is_lock"] = locking_mask(text)
    if "system" in groups:
        cols["is_system"] = system_mask(text)
    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    return batch
