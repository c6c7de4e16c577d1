"""Salted-repartition aggregation: must equal the unsalted result exactly."""

from __future__ import annotations

from pgweasel_ray.pipelines.common import grouped_count, grouped_count_salted
from pgweasel_ray.sources.transcripts import read_transcripts


def test_salted_equals_unsalted(sf_dir):
    ds = read_transcripts(sf_dir, columns=["conv_id"])
    plain = (
        grouped_count(ds, ["conv_id"]).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    ds2 = read_transcripts(sf_dir, columns=["conv_id"])
    salted = (
        grouped_count_salted(ds2, ["conv_id"], salt=4).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    assert "_salt" not in salted.columns
    assert plain.equals(salted)
    # the hot convs (15% of turns each) are present and correct
    assert salted["cnt"].max() >= 0.10 * salted["cnt"].sum()


def test_day_salted_sessionization_equals_unsalted(sf_dir, tmp_path):
    """(user_id, day)-salted split-merge sessionization == the unsalted
    path, on a corpus where ONE user owns 50% of events including
    midnight-spanning sessions (the pathological-user case the salt
    exists for)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pgweasel_ray.pipelines.windows import events_user_sessions

    rng = np.random.default_rng(5)
    rows = []
    base = np.datetime64("2026-01-01T00:00:00", "us")
    # hot user 0: events every ~20 min for 5 days (sessions span midnight)
    t = base
    for _ in range(360):
        t = t + np.timedelta64(int(rng.integers(60, 2400)), "s")
        rows.append((0, t))
    # 20 normal users with sparse events
    for u in range(1, 21):
        t = base
        for _ in range(18):
            t = t + np.timedelta64(int(rng.integers(600, 90000)), "s")
            rows.append((u, t))
    users, ts = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(users, type=pa.int64()),
                "ts": pa.array(list(ts), type=pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )
    plain = (
        events_user_sessions(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    salted = (
        events_user_sessions(str(tmp_path), salt_days=True).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    assert plain.equals(salted)
    assert plain.loc[plain["user_id"] == 0, "n_events"].iloc[0] == 360
