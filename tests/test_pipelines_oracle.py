"""End-to-end pipeline tests: every oracle-expressible query compared against
DuckDB over the identical parquet bytes at sf0.001 (the reference test
strategy — SURVEY.md §5 — strengthened from substring assertions to full
set equality on deterministic fixtures)."""

from __future__ import annotations

import pytest

from pgweasel_ray.oracle_queries import build_oracles
from pgweasel_ray.testing import compare, duckdb_with_views, to_df

def _queries():
    import __ray_entry__ as m

    return m.queries()


@pytest.fixture(scope="module")
def oracles(sf_dir):
    return build_oracles(sf_dir)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_with_views(sf_dir)


def _oracle_checked_names():
    return sorted(build_oracles("/root/testdata/sf0.001").keys())


@pytest.mark.parametrize("name", _oracle_checked_names())
def test_query_matches_oracle(name, sf_dir, oracles, con):
    fn = _queries()[name]
    ray_df = to_df(fn(sf_dir))
    ora_df = con.sql(oracles[name]).df()
    assert compare(ray_df, ora_df) == "OK"


def test_sessions_transcript_is_turn_ordered(sf_dir):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the per-row invariant from BASELINE.json input_hint."""
    from pgweasel_ray.pipelines.core import sessions
    from pgweasel_ray.sources.transcripts import transcripts_glob

    import duckdb

    s = to_df(sessions(sf_dir)).set_index("conv_id")
    ref = duckdb.sql(
        f"""SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) t
            FROM read_parquet('{transcripts_glob(sf_dir)}') GROUP BY conv_id"""
    ).df().set_index("conv_id")
    for conv_id, row in ref.iterrows():
        assert s.loc[conv_id, "transcript"] == row["t"]


def test_errors_list_defaults_match_reference():
    """Severity floor defaults: Error for errors (main.rs:85-87), Log
    elsewhere; slow threshold 3 s (main.rs:157); top-k 10 (main.rs:153);
    top-N 20 (main.rs:93)."""
    from pgweasel_ray.pipelines import core

    assert core.ERROR_RANK == 8
    assert core.LOG_RANK == 5
    assert core.SLOW_THRESHOLD_MS == 3000.0
    assert core.TOP_SLOW_K == 10
    assert core.TOP_N_MESSAGES == 20
    assert core.HIST_WIDTH_S == 3600
    assert core.CONN_BUCKET_S == 600
