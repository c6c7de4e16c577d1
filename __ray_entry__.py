"""Driver contract for the pgweasel_ray engine.

``entry()`` runs the flagship parse → enrich → route → aggregate pipeline on
sf0.001. ``queries()`` exposes one callable per implemented operator
(SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent SQL. The
transcript input table (BASELINE.json input_hint shape) does not exist in
/root/testdata, so it is synthesised deterministically per sf
(pgweasel_ray/sources/transcripts.py) and BOTH sides — Ray and DuckDB —
read the identical parquet bytes; regex/needle fragments in the SQL are
generated from the same tables the kernels use (pgweasel_ray/oracle.py).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"  # the driver's correctness scale


def entry() -> Any:
    """Flagship: route (resumable partitioned sink) + broadcast-enriched
    severity counts on sf0.001."""
    from pgweasel_ray.pipelines import core, router

    router.route(SF001)
    return core.enriched_severity_counts(SF001)


def queries() -> dict[str, Callable[[str], Any]]:
    from pgweasel_ray.pipelines import core, dataprep, events, router

    q: dict[str, Callable[[str], Any]] = {
        # pgweasel parity — errors family (SURVEY §2.3 F1, §2.4 A1/A2, §3.1)
        "errors_list": core.errors_list,
        "errors_by_severity": core.errors_by_severity,
        "errors_top_messages": core.errors_top_messages,
        "errors_hist": core.errors_hist,
        "errors_masked": core.errors_masked,       # F3 mask/contains
        "errors_window": core.errors_window,       # F2 time range
        # slow family (F4, A3, §3.2)
        "slow_list": core.slow_list,
        "slow_top": core.slow_top,
        # locks / system (F5, F6)
        "locks": core.locks,
        "system": core.system,
        # connections (A4, §3.3)
        "connections_summary": core.connections_summary,
        "connections_by_host": core.connections_by_host,
        "connections_by_user": core.connections_by_user,
        "connections_by_db": core.connections_by_db,
        "connections_by_appname": core.connections_by_appname,
        "connections_by_bucket": core.connections_by_bucket,
        # north_star additions
        "sessions": core.sessions,
        "enriched_severity_counts": core.enriched_severity_counts,
        "routed_counts": router.routed_counts,
        # aggregate layer over the native events table
        "events_per_hour": events.events_per_hour,
        "events_top_types": events.events_top_types,
        "events_value_range": events.events_value_range,
        # training-data ops (documents / embeddings)
        "dedup_exact": dataprep.dedup_exact,
        "dedup_minhash": dataprep.dedup_minhash,          # rows-only
        "dedup_simhash": dataprep.dedup_simhash,          # rows-only
        "docs_token_stats": dataprep.docs_token_stats,
        "docs_quality": dataprep.docs_quality,
        "docs_lang_id": dataprep.docs_lang_id,            # rows-only
        "docs_fingerprint": dataprep.docs_fingerprint,    # rows-only
        "ann_cosine_topk": dataprep.ann_cosine_topk,
        "ann_lsh_topk": dataprep.ann_lsh_topk,            # rows-only
        "embed_neardup": dataprep.embed_neardup,          # rows-only
    }
    return q


def oracle_sql() -> dict[str, str]:
    from pgweasel_ray import oracle
    from pgweasel_ray.pipelines import core
    from pgweasel_ray.sources.transcripts import (
        ensure_fixture,
        fixture_dir,
        lookup_path,
        transcripts_glob,
    )

    ensure_fixture(SF_ORACLE)  # oracle may run before the Ray query
    glob = transcripts_glob(SF_ORACLE)
    cte = oracle.parsed_cte(glob)
    role_pq = str(lookup_path(SF_ORACLE, "role_tenant"))
    tool_pq = str(lookup_path(SF_ORACLE, "tool_subsystem"))

    h1 = oracle.bucket_expr(core.HIST_WIDTH_S)
    b10 = oracle.bucket_expr(core.CONN_BUCKET_S)
    eh = oracle.bucket_expr(3600)

    sql = {
        "errors_list": f"""{cte}
SELECT conv_id, turn_idx, severity, message, text FROM parsed
WHERE severity_rank >= {core.ERROR_RANK}""",
        "errors_by_severity": f"""{cte}
SELECT severity, count(*) AS cnt FROM parsed
WHERE severity_rank >= {core.ERROR_RANK} GROUP BY severity""",
        "errors_top_messages": f"""{cte}
SELECT message, count(*) AS cnt FROM parsed
WHERE severity_rank >= {core.ERROR_RANK} AND message IS NOT NULL
GROUP BY message ORDER BY cnt DESC, message LIMIT {core.TOP_N_MESSAGES}""",
        "errors_hist": f"""{cte}
SELECT {h1} AS bucket_ts, count(*) AS cnt FROM parsed
WHERE severity_rank >= {core.ERROR_RANK} GROUP BY bucket_ts ORDER BY bucket_ts""",
        "errors_masked": f"""{cte}
SELECT conv_id, turn_idx, severity, text FROM parsed
WHERE contains(text, '{core.MASK_SUBSTRING}')
  AND severity_rank >= {core.ERROR_RANK}""",
        "errors_window": f"""{cte}
SELECT conv_id, turn_idx, severity, text FROM parsed
WHERE severity_rank >= {core.ERROR_RANK}
  AND ts >= TIMESTAMP '{core.WINDOW_BEGIN}' AND ts <= TIMESTAMP '{core.WINDOW_END}'""",
        "slow_list": f"""{cte}
SELECT conv_id, turn_idx, duration_ms, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND duration_ms > {core.SLOW_THRESHOLD_MS}""",
        "slow_top": f"""{cte}
SELECT conv_id, turn_idx, duration_ms, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND duration_ms IS NOT NULL
ORDER BY duration_ms DESC, conv_id, turn_idx LIMIT {core.TOP_SLOW_K}""",
        "locks": f"""{cte}
SELECT conv_id, turn_idx, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND is_lock""",
        "system": f"""{cte}
SELECT conv_id, turn_idx, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND is_system""",
        "connections_summary": f"""{cte}
SELECT
  sum(CASE WHEN event = 'received' THEN 1 ELSE 0 END)::BIGINT AS attempts,
  sum(CASE WHEN event = 'authorized' THEN 1 ELSE 0 END)::BIGINT AS authenticated,
  sum(CASE WHEN {oracle.ssl_expr()} THEN 1 ELSE 0 END)::BIGINT AS authenticated_ssl,
  sum(CASE WHEN event = 'auth_failure' THEN 1 ELSE 0 END)::BIGINT AS failures
FROM parsed""",
        "connections_by_host": f"""{cte}
SELECT coalesce(host, 'unknown') AS host, count(*) AS cnt FROM parsed
WHERE event = 'received' GROUP BY 1""",
        "connections_by_user": f"""{cte}
SELECT coalesce("user", 'unknown') AS "user", count(*) AS cnt FROM parsed
WHERE event = 'authorized' GROUP BY 1""",
        "connections_by_db": f"""{cte}
SELECT coalesce(db, 'unknown') AS db, count(*) AS cnt FROM parsed
WHERE event = 'authorized' GROUP BY 1""",
        "connections_by_appname": f"""{cte}
SELECT coalesce(appname, 'unknown') AS appname, count(*) AS cnt FROM parsed
WHERE event = 'authorized' GROUP BY 1""",
        "connections_by_bucket": f"""{cte}
SELECT {b10} AS bucket_ts, count(*) AS cnt FROM parsed
WHERE event = 'received' GROUP BY bucket_ts ORDER BY bucket_ts""",
        "sessions": f"""{cte}
SELECT conv_id,
       count(*)::BIGINT AS n_turns,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       sum(CASE WHEN severity_rank >= {core.ERROR_RANK} THEN 1 ELSE 0 END)::BIGINT AS n_errors,
       string_agg(text, chr(10) ORDER BY turn_idx) AS transcript
FROM parsed GROUP BY conv_id""",
        "enriched_severity_counts": f"""{cte}
SELECT coalesce(rt.tenant, 'unknown') AS tenant,
       coalesce(tsb.subsystem, 'unknown') AS subsystem,
       p.severity, count(*) AS cnt
FROM parsed p
LEFT JOIN read_parquet('{role_pq}') rt ON p.role = rt.role
LEFT JOIN read_parquet('{tool_pq}') tsb ON p.tool = tsb.tool
GROUP BY 1, 2, 3""",
        "routed_counts": f"""{cte}
SELECT severity, count(*) AS cnt FROM parsed GROUP BY severity ORDER BY severity""",
        # --- events table (native view) ---
        "events_per_hour": f"""
SELECT {eh} AS bucket_ts, count(*) AS cnt FROM events
GROUP BY bucket_ts ORDER BY bucket_ts""",
        "events_top_types": """
SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type""",
        "events_value_range": """
SELECT event_type, min(value) AS min_value, max(value) AS max_value,
       count(*) AS cnt
FROM events GROUP BY event_type""",
        # --- documents / embeddings ---
        "dedup_exact": """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text""",
        "docs_token_stats": r"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
FROM documents""",
        "docs_quality": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
       len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is|it)\b'))::BIGINT AS n_stop,
       len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
       (len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is|it)\b'))::DOUBLE
        / nullif(len(regexp_extract_all(text, '\S+')), 0)) AS stop_ratio
FROM documents""",
        "ann_cosine_topk": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id
FROM embeddings e, q
ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id
LIMIT 10""",
    }
    return sql
