"""DuckDB oracle-SQL fragments, generated from the SAME pattern tables the
Ray kernels use (``pgweasel_ray.patterns`` / ``severity``).

DuckDB embeds RE2, as does pyarrow.compute — so every regex below is the
identical pattern string the kernels run, and the severity needle chain is
rendered from the same ordered list. Ray-vs-oracle agreement is therefore a
check of the *pipeline* (distribution, shuffles, sinks), not of two
hand-maintained regex dialects.
"""

from __future__ import annotations

from . import patterns, severity as sev


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def severity_case() -> str:
    whens = " ".join(
        f"WHEN contains(text, {_sq(needle)}) THEN {_sq(name)}"
        for needle, name in sev.PLAIN_NEEDLES
    )
    return f"CASE {whens} ELSE {_sq(sev.DEFAULT_SEVERITY)} END"


def rank_case() -> str:
    whens = " ".join(
        f"WHEN contains(text, {_sq(needle)}) THEN {sev.RANK[name]}"
        for needle, name in sev.PLAIN_NEEDLES
    )
    return f"CASE {whens} ELSE {sev.RANK[sev.DEFAULT_SEVERITY]} END"


def message_expr() -> str:
    p = _sq(patterns.MESSAGE_PATTERN)
    return (
        f"CASE WHEN regexp_matches(text, {p}) "
        f"THEN regexp_extract(text, {p}, 1) END"
    )


def duration_ms_expr() -> str:
    p = _sq(patterns.DURATION_PATTERN)
    val = f"try_cast(regexp_extract(text, {p}, 1) AS DOUBLE)"
    whens = []
    for unit, (mode, scale) in patterns.DURATION_UNIT_TO_MS.items():
        base = f"floor({val})" if mode == "trunc" else val
        whens.append(f"WHEN {_sq(unit)} THEN {base} * {scale!r}")
    return (
        f"CASE regexp_extract(text, {p}, 2) " + " ".join(whens) + " ELSE NULL END"
    )


def kv_expr(field: str) -> str:
    p = _sq(patterns.KV_PATTERNS[field])
    return (
        f"CASE WHEN regexp_matches(text, {p}) "
        f"THEN regexp_extract(text, {p}, 1) END"
    )


def lock_expr() -> str:
    return f"regexp_matches(text, {_sq(patterns.LOCKING_PATTERN)})"


def system_expr() -> str:
    return f"regexp_matches(text, {_sq(patterns.SYSTEM_PATTERN)})"


def event_expr() -> str:
    """References ``severity`` and ``message`` columns (use inside the second
    CTE layer)."""
    fail = " OR ".join(
        f"contains(text, {_sq(n)})" for n in patterns.AUTH_FAILURE_NEEDLES
    )
    return (
        "CASE "
        f"WHEN severity = 'fatal' AND ({fail}) THEN 'auth_failure' "
        "WHEN severity = 'log' AND message IS NOT NULL AND "
        f"starts_with(message, {_sq(patterns.CONN_RECEIVED_PREFIX)}) THEN 'received' "
        "WHEN severity = 'log' AND message IS NOT NULL AND "
        f"starts_with(message, {_sq(patterns.CONN_AUTHORIZED_PREFIX)}) THEN 'authorized' "
        "WHEN severity = 'log' AND message IS NOT NULL AND "
        f"starts_with(message, {_sq(patterns.DISCONNECTION_PREFIX)}) THEN 'disconnection' "
        "END"
    )


def ssl_expr() -> str:
    return (
        "(event = 'authorized' AND "
        f"contains(message, {_sq(patterns.SSL_NEEDLE)}))"
    )


def bucket_expr(width_s: int, ts_col: str = "ts") -> str:
    w_us = width_s * 1_000_000
    return f"make_timestamp(((epoch_us({ts_col}) // {w_us}) * {w_us})::BIGINT)"


def parsed_cte(transcripts_glob: str) -> str:
    """Two-layer CTE: ``p0`` (scalar extracts) → ``parsed`` (adds event/ssl).
    Every transcripts oracle query is a short SELECT over ``parsed``."""
    return f"""
WITH p0 AS (
  SELECT conv_id, turn_idx, role, tool, ts, text,
         {severity_case()} AS severity,
         {rank_case()} AS severity_rank,
         {message_expr()} AS message,
         {duration_ms_expr()} AS duration_ms,
         {kv_expr('host')} AS host,
         {kv_expr('user')} AS "user",
         {kv_expr('db')} AS db,
         {kv_expr('appname')} AS appname,
         {lock_expr()} AS is_lock,
         {system_expr()} AS is_system
  FROM read_parquet({_sq(transcripts_glob)})
),
parsed AS (
  SELECT *, {event_expr()} AS event FROM p0
)"""
