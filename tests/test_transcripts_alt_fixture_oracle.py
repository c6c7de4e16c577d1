"""Full transcripts-family parity on ALTERNATIVE fixtures: the generator
seeds from the sf NAME, so names the driver never uses ("sfalt1"/"sfalt2")
yield fresh conversations, severities, durations and kv fields through the
exact same end-to-end path the driver gates (build_oracles + registry
callables) — different-data evidence for every parse/aggregate/graph/
conversational query, with zero test-local SQL."""

from __future__ import annotations

import duckdb
import pytest

from pgweasel_ray.testing import compare, to_df

# transcripts-only queries (their oracles read the transcript glob / parsed
# CTE directly — no events/documents/embeddings views needed)
QUERIES = [
    "errors_list", "errors_by_severity", "errors_top_messages",
    "errors_hist", "errors_masked", "errors_window", "errors_by_sqlstate",
    "slow_list", "slow_top", "locks", "system",
    "connections_summary", "connections_by_bucket", "connections_by_host",
    "connections_by_user", "connections_by_db", "connections_by_appname",
    "disconnections_by_host", "sessions", "sessions_top_errors",
    "conv_first_error", "flagged_conv_turns", "peaks", "stats",
    "severity_tool_rollup", "enriched_severity_counts",
    "conv_tool_transitions", "conv_tool_pagerank", "conv_tool_hits",
    "conv_response_latency", "conv_role_balance", "conv_context_growth",
    "conv_truncate_context", "conv_error_bursts", "conv_session_splits",
    "conv_loop_detect", "conv_context_cost",
]


@pytest.fixture(scope="module", params=["sfalt1", "sfalt2"])
def alt_sf(request, tmp_path_factory):
    # the dir NAME seeds the transcript fixture; the non-transcript tables
    # (only needed because build_oracles eagerly builds the data-bound
    # embeddings oracles) are symlinked from the sf0.001 testdata
    import os

    d = tmp_path_factory.mktemp("alt") / request.param
    d.mkdir()
    for t in ("events", "documents", "embeddings"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                   d / f"{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def alt_oracles(alt_sf):
    from pgweasel_ray.oracle_queries import build_oracles

    return build_oracles(alt_sf)  # generates the alt fixture on first use


@pytest.mark.parametrize("name", QUERIES)
def test_transcripts_query_matches_oracle_on_alt_fixture(
        alt_sf, alt_oracles, name):
    import __ray_entry__ as m

    got = to_df(m.queries()[name](alt_sf))
    con = duckdb.connect()
    want = con.sql(alt_oracles[name]).df()
    verdict = compare(got, want)
    assert verdict == "OK", f"{name}: {verdict}"
