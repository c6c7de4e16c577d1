"""Ray-vs-DuckDB parity for the round-4/5 events operators on RANDOM event
tables (not just the driver fixture): seeded generators with skewed types,
duplicate values (quantile/MAD tie paths), and multi-day spans. The oracle
SQL is the exact per-query SQL the driver runs (build_oracles), re-bound to
the random table via duckdb_with_views — distribution-independent evidence
for the queries the round-5 window gates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgweasel_ray.pipelines import events as events_mod
import duckdb

from pgweasel_ray.testing import compare, to_df

TYPES = ["click", "view", "purchase", "signup", "error", "scroll"]


def _random_events(seed: int, n: int = 4000) -> pa.Table:
    rng = np.random.default_rng(seed)
    # multi-day span starting well past LINFIT_EPOCH0 (2024-01-01): the
    # floor-div quantization hazard documented at events.py LINFIT_EPOCH0
    t0 = np.datetime64("2025-05-21T00:00:00", "us")
    ts = t0 + np.sort(rng.integers(0, 4 * 86_400_000_000, n)) \
        .astype("timedelta64[us]")
    # skewed types; duplicate-heavy values exercise selection ties
    type_idx = np.minimum(rng.geometric(0.45, n) - 1, len(TYPES) - 1)
    values = rng.integers(0, 200, n).astype(np.float64) / 8.0
    return pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 97, n), type=pa.int64()),
        "event_type": pa.array([TYPES[i] for i in type_idx]),
        "value": pa.array(values, type=pa.float64()),
        "props": pa.array(
            [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)]),
    })


@pytest.fixture(scope="module", params=[17, 907])
def events_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"revents{request.param}")
    pq.write_table(_random_events(request.param), d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def oracles():
    # events SQL reads only the `events` view — sf-independent, so the
    # driver-fixture build re-binds cleanly to the random table
    from pgweasel_ray.oracle_queries import build_oracles

    return build_oracles("/root/testdata/sf0.001")


QUERIES = [
    "events_value_mad",
    "events_daily_top_types",
    "events_value_bins",
    "events_value_hist_quantiles",
    "events_value_quantiles",
    "events_top_types",
    "events_anomaly",
    # round-5 extension: the full windowed/join/session family
    "events_per_hour",
    "events_sliding_avg",
    "events_props_k_sum",
    "events_value_corr",
    "events_value_linfit",
    "events_value_range",
    "events_asof_prior",
    "events_range_join",
    "events_funnel",
    "events_retention",
    "events_user_sessions",
    "events_user_sessions_salted",
    "events_late_arrivals",
    # round-5 close: exact-int CUSUM changepoint scan
    "events_cusum_drift",
]


@pytest.mark.parametrize("name", QUERIES)
def test_events_query_matches_oracle_on_random_table(
        events_dir, oracles, name):
    from pgweasel_ray.pipelines import windows as windows_pipe

    fn = getattr(events_mod, name, None) or getattr(windows_pipe, name)
    got = to_df(fn(events_dir))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{events_dir}/events.parquet')")
    want = con.sql(oracles[name]).df()
    verdict = compare(got, want)
    assert verdict == "OK", f"{name}: {verdict}"


def test_cusum_scan_python_int_path_matches_vectorized():
    """The overflow-guarded Python-int fallback of _cusum_block_scan must
    produce bit-identical (drift, position) to the int64 fast path."""
    from pgweasel_ray.pipelines.events import _cusum_block_scan

    rng = np.random.default_rng(5150)
    n = 500
    tbl = pa.table({
        "event_type": pa.array(["a"] * n),
        "ts": pa.array(np.arange(n), type=pa.int64()),
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "qv": pa.array(rng.integers(0, 10**6, n), type=pa.int64()),
    })
    tot = int(tbl["qv"].to_numpy().sum())
    fast = _cusum_block_scan(tbl, {"a": (0, 0)}, {"a": n}, {"a": tot})
    # force the exact loop by shrinking the bound via a huge fake n
    big = 10**12
    slow = _cusum_block_scan(
        tbl, {"a": (0, 0)}, {"a": big}, {"a": tot * (big // n)})
    # same argmax position; drift scales exactly with the n substitution
    assert fast["a"][1] == slow["a"][1]
