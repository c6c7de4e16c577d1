"""The named-query registry: every pipeline the engine exposes, by name.

Single source of truth for the driver contract (``__ray_entry__.queries()``
delegates here) and for the CLI's generic ``query`` subcommand, so a user
can run ANY engine pipeline by name over an sf-style data directory.

DICT ORDER IS LOAD-BEARING: the graft driver's correctness gate checks only
the FIRST 50 entries. Policy (VERDICT r03 item #1, r04 item #2): (1)
never-driver-green queries first, (2) queries whose implementation or
oracle changed this round, (3) the longest-unverified green queries;
long-stable queries re-verified within the last two rounds sit past slot
50. tests/test_round4.py pins the must-verify set inside the window and
tests/test_round5.py encodes the rotation policy over the cumulative
CORRECTNESS_r*.json ledger.

Round-5 window: slots 1-4 are the never-driver-green set (conv_tool_hits,
then — added at round-5 close — conv_role_handoffs + events_cusum_drift;
events_value_mad, events_daily_top_types per ADVICE r4; docs_pack_sequences
had rows+schema green but hash red in r04), slots 5-12 the new ExactSubstr
family (span report, span strip, novelty score) and the five new
conversational-analytics queries (response latency, role balance, context
growth, context truncation, error bursts), then
every query whose OUTPUT SHAPE changed this round (the 6
bounded survivor summaries) plus the shuffle-ending deterministic-order
fixes, then the nine queries last driver-green in r02. WINDOW-FULL
EXCEPTION (noted per ADVICE r4): more queries were touched this round than
fit — the ~25 order-only fixes left outside (connections_by_user/db/
appname, disconnections_by_host, events_top_types, errors_list,
errors_masked, locks, and the per-doc map-only sorts) have value-identical
outputs verified by this session's local order-sensitive sweep, and each
shares its exact code path with an in-window representative
(connections_by_host for _conn_grouped, events_value_range for the
events groupbys, slow_list/system for the record-list sorts,
docs_gopher_filter-class maps for the per-doc sorts).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def queries() -> dict[str, Callable[[str], Any]]:
    from .pipelines import core, dataprep, events, export, router, windows

    return {
        # --- tier A: never driver-green -----------------------------------
        "conv_tool_hits": windows.conv_tool_hits,
        "events_value_mad": events.events_value_mad,
        "events_daily_top_types": events.events_daily_top_types,
        "docs_pack_sequences": dataprep.docs_pack_sequences,
        # --- tier A: new in round 5 ---------------------------------------
        "dedup_exact_substr": dataprep.dedup_exact_substr,
        "docs_dup_span_strip": dataprep.docs_dup_span_strip,
        "docs_novelty": dataprep.docs_novelty,
        "docs_winnowing": dataprep.docs_winnowing,
        "docs_winnow_sim_topk": dataprep.docs_winnow_sim_topk,
        "conv_response_latency": windows.conv_response_latency,
        "conv_role_balance": windows.conv_role_balance,
        "conv_context_growth": windows.conv_context_growth,
        "conv_truncate_context": windows.conv_truncate_context,
        "conv_error_bursts": core.conv_error_bursts,
        "conv_session_splits": windows.conv_session_splits,
        "docs_chunk_overlap": dataprep.docs_chunk_overlap,
        "conv_loop_detect": windows.conv_loop_detect,
        "docs_type_token_stats": dataprep.docs_type_token_stats,
        "conv_context_cost": windows.conv_context_cost,
        "embed_kcenter_coreset": dataprep.embed_kcenter_coreset,
        "embed_label_outliers": dataprep.embed_label_outliers,
        "conv_role_handoffs": windows.conv_role_handoffs,
        "events_cusum_drift": events.events_cusum_drift,
        # --- tier B: pipeline/oracle touched in round 5 --------------------
        # (deterministic-order fix: final sort + matching oracle ORDER BY)
        "dedup_chunks": dataprep.dedup_chunks,
        "docs_strip_boilerplate": dataprep.docs_strip_boilerplate,
        "docs_tfidf_topk": dataprep.docs_tfidf_topk,
        "dedup_incremental": dataprep.dedup_incremental,
        "events_user_sessions_salted": windows.events_user_sessions_salted,
        "multimodal_image_stats": dataprep.multimodal_image_stats,
        "multimodal_audio_stats": dataprep.multimodal_audio_stats,
        "multimodal_video_frames": dataprep.multimodal_video_frames,
        "docs_line_dedup": dataprep.docs_line_dedup,
        "docs_source_stats": dataprep.docs_source_stats,
        "embed_label_centroids": dataprep.embed_label_centroids,
        "severity_tool_rollup": core.severity_tool_rollup,
        "docs_kmv_distinct": dataprep.docs_kmv_distinct,
        "dedup_exact": dataprep.dedup_exact,
        # gate-shape change (bounded survivor summary) in round 5:
        "dedup_minhash": dataprep.dedup_minhash,
        "dedup_ngram_jaccard": dataprep.dedup_ngram_jaccard,
        "dedup_simhash": dataprep.dedup_simhash,
        "docs_semdedup": dataprep.docs_semdedup,
        "embed_neardup": dataprep.embed_neardup,
        "events_asof_prior": windows.events_asof_prior,
        "errors_by_severity": core.errors_by_severity,
        "errors_window": core.errors_window,       # F2 time range
        "slow_list": core.slow_list,
        "connections_by_host": core.connections_by_host,
        "sessions": core.sessions,
        "events_value_range": events.events_value_range,
        "events_by_segment": windows.events_by_segment,
        # ---- slot 50 boundary ----------------------------------------------
        # Rotated out at round-5 close to admit conv_role_handoffs +
        # events_cusum_drift (never-checked outranks green per policy):
        # `events_user_sessions` (green r01-r04, the registry's
        # most-verified entry; its order-fixed path stays gated via the
        # value-identical in-window salted variant) and
        # `conv_tool_transitions` (green r03; its exact _keyed_blocks +
        # tree-sum + final-sort path is freshly exercised in-window by
        # the NEW conv_role_handoffs).
        "events_user_sessions": windows.events_user_sessions,
        "conv_tool_transitions": windows.conv_tool_transitions,
        # Rotated out mid-round-5 to admit the six new never-driver-
        # checked queries (docs_chunk_overlap, conv_loop_detect,
        # docs_type_token_stats, conv_context_cost, embed_kcenter_coreset,
        # embed_label_outliers): `system` and `events_props_k_sum`
        # (green r01-r03, order-only change this round; code paths gated
        # via slow_list and events_value_range), `events_value_linfit`
        # (green r04 — most recently re-verified, safest to rotate;
        # events-groupby path stays gated via events_value_range),
        # `flagged_conv_turns` (green r03; broadcast semi-join path gated
        # via events_by_segment), `conv_first_error` (green r03;
        # parse+groupby-first path gated via sessions/errors_by_severity),
        # and `ann_cosine_topk` (green r02; brute-scan path shares the
        # broadcast-matmul kernel with in-window embed_neardup).
        # events_by_segment stays IN-window deliberately: it is the only
        # Dataset.join (dimension-join) exercise in the registry.
        "conv_first_error": core.conv_first_error,
        "flagged_conv_turns": windows.flagged_conv_turns,
        "events_value_linfit": events.events_value_linfit,
        "ann_cosine_topk": dataprep.ann_cosine_topk,
        "system": core.system,
        "events_props_k_sum": events.events_props_k_sum,
        # Entries below were driver-green in r03/r04
        # and are untouched this round (eight r02-green tier-C entries —
        # docs_lang_id/docs_fingerprint/docs_scrub/docs_decontaminate/
        # docs_vocab_topk/docs_sample_hash/docs_length_quantiles/
        # corpus_prep — rotated out to make room for the eight new
        # never-driver-checked round-5 queries (five conversational-
        # analytics + session splits + the winnowing pair), which the
        # rotation policy ranks above longest-unverified-but-green; all
        # eight remain value-identical in this session's local sweep) --------
        "docs_lang_id": dataprep.docs_lang_id,
        "docs_fingerprint": dataprep.docs_fingerprint,
        "corpus_prep": dataprep.corpus_prep,
        "docs_scrub": dataprep.docs_scrub,
        "docs_decontaminate": dataprep.docs_decontaminate,
        "docs_vocab_topk": dataprep.docs_vocab_topk,
        "docs_sample_hash": dataprep.docs_sample_hash,
        "docs_length_quantiles": dataprep.docs_length_quantiles,
        "events_range_join": windows.events_range_join,
        # order-only fixes whose shared code path is verified in-window
        # by connections_by_host / events_value_range (window is full;
        # exception noted per ADVICE r4):
        "errors_by_sqlstate": core.errors_by_sqlstate,
        "enriched_severity_counts": core.enriched_severity_counts,
        "connections_by_user": core.connections_by_user,
        "connections_by_db": core.connections_by_db,
        "connections_by_appname": core.connections_by_appname,
        "disconnections_by_host": core.disconnections_by_host,
        "events_top_types": events.events_top_types,
        "ann_lsh_topk": dataprep.ann_lsh_topk,
        "ann_ivf_topk": dataprep.ann_ivf_topk,
        "corpus_export_counts": export.corpus_export_counts,
        "docs_distinct_hll": dataprep.docs_distinct_hll,
        "docs_gopher_filter": dataprep.docs_gopher_filter,
        "docs_lm_surprisal": dataprep.docs_lm_surprisal,
        "docs_mixture_sample": dataprep.docs_mixture_sample,
        "docs_normalize": dataprep.docs_normalize,
        "docs_repetition": dataprep.docs_repetition,
        "docs_select_budget": dataprep.docs_select_budget,
        "docs_shuffle_order": dataprep.docs_shuffle_order,
        "docs_topk_per_source": dataprep.docs_topk_per_source,
        "routed_counts": router.routed_counts,
        "docs_minhash_sim_topk": dataprep.docs_minhash_sim_topk,
        "docs_contamination_overlap": dataprep.docs_contamination_overlap,
        "docs_heavy_hitters_cms": dataprep.docs_heavy_hitters_cms,
        "docs_stratified_sample": dataprep.docs_stratified_sample,
        "events_value_hist_quantiles": events.events_value_hist_quantiles,
        "docs_weighted_sample": dataprep.docs_weighted_sample,
        "docs_inverted_postings": dataprep.docs_inverted_postings,
        "docs_decontaminate_bloom": dataprep.docs_decontaminate_bloom,
        "docs_source_distinct_hll": dataprep.docs_source_distinct_hll,
        "docs_bigram_surprisal": dataprep.docs_bigram_surprisal,
        "conv_tool_pagerank": windows.conv_tool_pagerank,
        "events_late_arrivals": events.events_late_arrivals,
        "docs_char_entropy": dataprep.docs_char_entropy,
        "events_value_corr": events.events_value_corr,
        "docs_pmi_topk": dataprep.docs_pmi_topk,
        "embed_kmeans_centroids": dataprep.embed_kmeans_centroids,
        "events_value_bins": events.events_value_bins,
        "dedup_components": dataprep.dedup_components,
        "dedup_cluster_best": dataprep.dedup_cluster_best,
        "docs_quality": dataprep.docs_quality,
        "docs_quality_filter": dataprep.docs_quality_filter,
        "events_value_quantiles": events.events_value_quantiles,
        "events_retention": events.events_retention,
        "events_funnel": events.events_funnel,
        "events_anomaly": events.events_anomaly,
        "docs_token_stats": dataprep.docs_token_stats,
        "docs_bpe_tokens": dataprep.docs_bpe_tokens,
        "errors_list": core.errors_list,
        "errors_top_messages": core.errors_top_messages,
        "errors_hist": core.errors_hist,
        "errors_masked": core.errors_masked,       # F3 mask/contains
        "slow_top": core.slow_top,
        "locks": core.locks,
        "connections_summary": core.connections_summary,
        "connections_by_bucket": core.connections_by_bucket,
        "sessions_top_errors": core.sessions_top_errors,
        "events_per_hour": events.events_per_hour,
        "events_sliding_avg": windows.events_sliding_avg,
        "peaks": windows.peaks,
        "stats": windows.stats,
    }
