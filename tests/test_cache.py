"""parse-once cache: every *_from(parsed) variant must equal its end-to-end
sibling — this is what licenses bench.py to time operators on the cache."""

from __future__ import annotations

import pandas as pd
import pytest

from pgweasel_ray.pipelines import cache, core
from pgweasel_ray.testing import to_df


@pytest.fixture(scope="module")
def parsed(sf_dir):
    return cache.parse_full(sf_dir)


def _eq(a, b):
    da, db = to_df(a), to_df(b)
    da = da.sort_values(list(da.columns)).reset_index(drop=True)
    db = db.sort_values(list(db.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(da, db, check_like=True)


def test_errors_by_severity_from(parsed, sf_dir):
    _eq(cache.errors_by_severity_from(parsed), core.errors_by_severity(sf_dir))


def test_errors_top_messages_from(parsed, sf_dir):
    _eq(cache.errors_top_messages_from(parsed),
        core.errors_top_messages(sf_dir))


def test_errors_hist_from(parsed, sf_dir):
    _eq(cache.errors_hist_from(parsed), core.errors_hist(sf_dir))


def test_slow_top_from(parsed, sf_dir):
    _eq(cache.slow_top_from(parsed), core.slow_top(sf_dir))


def test_locks_from(parsed, sf_dir):
    _eq(cache.locks_from(parsed), core.locks(sf_dir))


def test_connections_summary_from(parsed, sf_dir):
    _eq(cache.connections_summary_from(parsed),
        core.connections_summary(sf_dir))


def test_sessions_from(parsed, sf_dir):
    _eq(cache.sessions_from(parsed), core.sessions(sf_dir))


def test_enriched_from(parsed, sf_dir):
    _eq(cache.enriched_severity_counts_from(parsed, sf_dir),
        core.enriched_severity_counts(sf_dir))
