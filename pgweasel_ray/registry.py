"""The named-query registry: every pipeline the engine exposes, by name.

Single source of truth for the driver contract (``__ray_entry__.queries()``
delegates here) and for the CLI's generic ``query`` subcommand, so a user
can run ANY engine pipeline by name over an sf-style data directory.

DICT ORDER IS LOAD-BEARING: the graft driver's correctness gate checks only
the FIRST 50 entries. Policy (VERDICT r03 item #1): never-driver-green
queries first, then queries whose implementation changed this round, then a
rotation of recently-green ones; long-stable parity queries (green since
r01) sit past slot 50. tests/test_round4.py
(test_driver_window_covers_must_verify) pins the must-verify set inside the
window.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def queries() -> dict[str, Callable[[str], Any]]:
    from .pipelines import core, dataprep, events, export, router, windows

    return {
        # --- tier A: failed r01 / never re-checked by the driver ---------
        "ann_lsh_topk": dataprep.ann_lsh_topk,
        "ann_ivf_topk": dataprep.ann_ivf_topk,
        "embed_neardup": dataprep.embed_neardup,
        # --- tier A: added r03, never inside the driver window -----------
        "corpus_export_counts": export.corpus_export_counts,
        "dedup_chunks": dataprep.dedup_chunks,
        "docs_distinct_hll": dataprep.docs_distinct_hll,
        "docs_gopher_filter": dataprep.docs_gopher_filter,
        "docs_lm_surprisal": dataprep.docs_lm_surprisal,
        "docs_mixture_sample": dataprep.docs_mixture_sample,
        "docs_normalize": dataprep.docs_normalize,
        "docs_pack_sequences": dataprep.docs_pack_sequences,
        "docs_repetition": dataprep.docs_repetition,
        "docs_select_budget": dataprep.docs_select_budget,
        "docs_semdedup": dataprep.docs_semdedup,
        "docs_shuffle_order": dataprep.docs_shuffle_order,
        "docs_strip_boilerplate": dataprep.docs_strip_boilerplate,
        "docs_tfidf_topk": dataprep.docs_tfidf_topk,
        "docs_topk_per_source": dataprep.docs_topk_per_source,
        # --- tier B: implementation touched in round 4 -------------------
        "dedup_incremental": dataprep.dedup_incremental,
        "dedup_ngram_jaccard": dataprep.dedup_ngram_jaccard,
        "events_user_sessions": windows.events_user_sessions,
        "routed_counts": router.routed_counts,
        # --- tier B: new in round 4 ---------------------------------------
        "multimodal_image_stats": dataprep.multimodal_image_stats,
        "multimodal_audio_stats": dataprep.multimodal_audio_stats,
        "docs_minhash_sim_topk": dataprep.docs_minhash_sim_topk,
        "docs_line_dedup": dataprep.docs_line_dedup,
        "docs_contamination_overlap": dataprep.docs_contamination_overlap,
        "docs_heavy_hitters_cms": dataprep.docs_heavy_hitters_cms,
        "docs_source_stats": dataprep.docs_source_stats,
        "events_user_sessions_salted": windows.events_user_sessions_salted,
        "events_range_join": windows.events_range_join,
        "docs_stratified_sample": dataprep.docs_stratified_sample,
        "embed_label_centroids": dataprep.embed_label_centroids,
        "events_value_hist_quantiles": events.events_value_hist_quantiles,
        "docs_weighted_sample": dataprep.docs_weighted_sample,
        "docs_inverted_postings": dataprep.docs_inverted_postings,
        "docs_decontaminate_bloom": dataprep.docs_decontaminate_bloom,
        "docs_source_distinct_hll": dataprep.docs_source_distinct_hll,
        "multimodal_video_frames": dataprep.multimodal_video_frames,
        "docs_bigram_surprisal": dataprep.docs_bigram_surprisal,
        "severity_tool_rollup": core.severity_tool_rollup,
        "conv_tool_pagerank": windows.conv_tool_pagerank,
        "docs_kmv_distinct": dataprep.docs_kmv_distinct,
        "events_value_linfit": events.events_value_linfit,
        "events_late_arrivals": events.events_late_arrivals,
        "docs_char_entropy": dataprep.docs_char_entropy,
        "events_value_corr": events.events_value_corr,
        "docs_pmi_topk": dataprep.docs_pmi_topk,
        "embed_kmeans_centroids": dataprep.embed_kmeans_centroids,
        "events_value_bins": events.events_value_bins,
        # --- tier C: r02-green, pushed out of the r03 window --------------
        # ---- slot 50 boundary: entries below are long-stable (green since
        # r01/r02), r02/r03-green, or (conv_tool_hits) added after the
        # round-4 window filled with 50 must-verify entries — first
        # window candidate for round 5 --------------------------------------
        "conv_tool_hits": windows.conv_tool_hits,
        "events_value_mad": events.events_value_mad,
        "events_daily_top_types": events.events_daily_top_types,
        "ann_cosine_topk": dataprep.ann_cosine_topk,
        "docs_lang_id": dataprep.docs_lang_id,
        "docs_fingerprint": dataprep.docs_fingerprint,
        "docs_scrub": dataprep.docs_scrub,
        "corpus_prep": dataprep.corpus_prep,
        "docs_decontaminate": dataprep.docs_decontaminate,
        "docs_vocab_topk": dataprep.docs_vocab_topk,
        "docs_sample_hash": dataprep.docs_sample_hash,
        "docs_length_quantiles": dataprep.docs_length_quantiles,
        "dedup_exact": dataprep.dedup_exact,
        "dedup_minhash": dataprep.dedup_minhash,
        "dedup_components": dataprep.dedup_components,
        "dedup_cluster_best": dataprep.dedup_cluster_best,
        "dedup_simhash": dataprep.dedup_simhash,
        "docs_quality": dataprep.docs_quality,
        "docs_quality_filter": dataprep.docs_quality_filter,
        "events_value_quantiles": events.events_value_quantiles,
        "events_retention": events.events_retention,
        "events_funnel": events.events_funnel,
        "events_anomaly": events.events_anomaly,
        "events_asof_prior": windows.events_asof_prior,
        "docs_token_stats": dataprep.docs_token_stats,
        "docs_bpe_tokens": dataprep.docs_bpe_tokens,
        "errors_list": core.errors_list,
        "errors_by_severity": core.errors_by_severity,
        "errors_top_messages": core.errors_top_messages,
        "errors_hist": core.errors_hist,
        "errors_masked": core.errors_masked,       # F3 mask/contains
        "errors_window": core.errors_window,       # F2 time range
        "slow_list": core.slow_list,
        "slow_top": core.slow_top,
        "locks": core.locks,
        "system": core.system,
        "connections_summary": core.connections_summary,
        "connections_by_host": core.connections_by_host,
        "connections_by_user": core.connections_by_user,
        "connections_by_db": core.connections_by_db,
        "connections_by_appname": core.connections_by_appname,
        "connections_by_bucket": core.connections_by_bucket,
        "errors_by_sqlstate": core.errors_by_sqlstate,
        "disconnections_by_host": core.disconnections_by_host,
        "sessions": core.sessions,
        "sessions_top_errors": core.sessions_top_errors,
        "conv_first_error": core.conv_first_error,
        "enriched_severity_counts": core.enriched_severity_counts,
        "events_per_hour": events.events_per_hour,
        "events_top_types": events.events_top_types,
        "events_value_range": events.events_value_range,
        "events_props_k_sum": events.events_props_k_sum,
        "events_sliding_avg": windows.events_sliding_avg,
        "conv_tool_transitions": windows.conv_tool_transitions,
        "events_by_segment": windows.events_by_segment,
        "flagged_conv_turns": windows.flagged_conv_turns,
        "peaks": windows.peaks,
        "stats": windows.stats,
    }
