"""Windowed / join operators the reference lacks (custom operators per the
graft brief): gap-based sessionization of the events stream, a
hash-partitioned join against a dimension table, a broadcast semi-join, and
the reference's two *unimplemented* subcommands (``peaks``, ``stats`` —
/root/reference/src/main.rs:147-149 prints "Not implemented") realized as
first-class aggregates.

All are Ray-Data-first and scale-shaped:
- sessionization is ``groupby(user_id).map_groups`` over ts-sorted groups —
  the partitioning assumption is that one user's events fit one worker
  (bound by per-user activity; salt by day for pathological users);
- the dimension join uses ``Dataset.join`` (hash-partitioned) with the big
  side streamed;
- the semi-join broadcasts the (small) flagged-key set instead of shuffling
  the big side.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..kernels import parse_table
from ..sources.transcripts import read_transcripts
from ..stages.parse import add_bucket, parse_filter_project
from .common import grouped_count, global_sums

SESSION_GAP_S = 1800  # 30 min


def _events(sf_dir: str, columns: list[str]):
    import ray.data

    return ray.data.read_parquet(
        str(Path(sf_dir) / "events.parquet"), columns=columns
    )


# --- gap sessionization (tumbling/session window) ----------------------------

def _sessionize_block(df: pd.DataFrame) -> pd.DataFrame:
    """Gap sessionization for one user_id-exclusive hash partition: one
    vectorized groupby.diff over the whole block instead of a per-user
    Python call."""
    if df.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "n_sessions": pd.Series([], dtype="int64"),
            }
        )
    df = df.sort_values(["user_id", "ts"], kind="mergesort")
    gaps = df.groupby("user_id", sort=False)["ts"].diff()
    df["_new"] = (
        gaps.isna() | (gaps > pd.Timedelta(seconds=SESSION_GAP_S))
    ).astype("int64")
    g = df.groupby("user_id", sort=False)
    return pd.DataFrame(
        {
            "n_events": g.size().astype("int64"),
            "n_sessions": g["_new"].sum().astype("int64"),
        }
    ).reset_index()[["user_id", "n_events", "n_sessions"]]


def events_user_sessions(sf_dir: str, salt_days: bool = False) -> Dataset:
    """Per-user session count with a 30-min inactivity gap (strictly greater
    ⇒ new session). The streaming-window equivalent for a batch table:
    keyed HASH repartition co-locates each user's events in one block, then
    one vectorized pandas pass per block (see core.sessions for the shape
    rationale).

    Default partitioning assumption: one user's events fit one worker.
    ``salt_days=True`` removes it for pathological users (one user owning
    a visible fraction of the stream): the key becomes (user_id, day), a
    per-day partial sessionization runs in the salted blocks, and a
    second tiny exchange over the PARTIALS (one row per user-day) merges
    at the day boundaries — exactly equal to the unsalted output
    (asserted in test_salted)."""
    import ray

    from .common import hash_shuffle

    with hash_shuffle():
        ds = _events(sf_dir, ["user_id", "ts"])
        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
        if not salt_days:
            parts = ds.repartition(n_parts, keys=["user_id"], sort=False)
            return parts.map_batches(
                _sessionize_block, batch_format="pandas", batch_size=None
            ).sort("user_id")  # deterministic driver-hash order
        salted = ds.map_batches(
            _add_day, batch_format="pyarrow", zero_copy_batch=True
        ).repartition(n_parts, keys=["user_id", "_day"], sort=False)
        partials = salted.map_batches(
            _sessionize_day_partials, batch_format="pandas", batch_size=None
        ).materialize()
    from .dataprep import _keyed_blocks

    return _keyed_blocks(partials, ["user_id"], _merge_day_partials
                         ).sort("user_id")  # deterministic driver-hash order


def events_user_sessions_salted(sf_dir: str) -> Dataset:
    """Driver-facing wrapper for the (user_id, day)-salted split-merge
    path; shares the unsalted query's oracle (identical result required)."""
    return events_user_sessions(sf_dir, salt_days=True)


def _add_day(batch: pa.Table) -> pa.Table:
    us = pc.cast(batch["ts"], pa.int64())
    day = pc.divide(us, 86_400_000_000)
    return batch.append_column("_day", pc.cast(day, pa.int64()))


def _sessionize_day_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Within one (user_id, day)-exclusive salted block: per user-day
    partials (event count, within-day session count, first/last ts) —
    the mergeable decomposition of gap sessionization."""
    if df.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "_day": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "n_sessions": pd.Series([], dtype="int64"),
                "first_ts": pd.Series([], dtype="datetime64[us]"),
                "last_ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
    df = df.sort_values(["user_id", "_day", "ts"], kind="mergesort")
    gaps = df.groupby(["user_id", "_day"], sort=False)["ts"].diff()
    df["_new"] = (
        gaps.isna() | (gaps > pd.Timedelta(seconds=SESSION_GAP_S))
    ).astype("int64")
    g = df.groupby(["user_id", "_day"], sort=False)
    out = pd.DataFrame(
        {
            "n_events": g.size().astype("int64"),
            "n_sessions": g["_new"].sum().astype("int64"),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
        }
    ).reset_index()
    return out[["user_id", "_day", "n_events", "n_sessions",
                "first_ts", "last_ts"]]


def _merge_day_partials(batch: pa.Table) -> pa.Table:
    """Merge per-day partials inside one user-exclusive partition: a
    session continues across a day boundary iff the gap between the
    previous day's last event and the next day's first event is <= the
    threshold (same strictly-greater rule), which joins two counted
    sessions into one."""
    df = batch.to_pandas()
    if df.empty:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "n_sessions": pa.array([], type=pa.int64()),
            }
        )
    df = df.sort_values(["user_id", "_day"], kind="mergesort")
    prev_last = df.groupby("user_id", sort=False)["last_ts"].shift()
    joined = (
        (df["first_ts"] - prev_last)
        <= pd.Timedelta(seconds=SESSION_GAP_S)
    ).fillna(False).astype("int64")
    df["_joined"] = joined
    g = df.groupby("user_id", sort=False)
    out = pd.DataFrame(
        {
            "n_events": g["n_events"].sum().astype("int64"),
            "n_sessions": (g["n_sessions"].sum()
                           - g["_joined"].sum()).astype("int64"),
        }
    ).reset_index()
    return pa.Table.from_pandas(
        out[["user_id", "n_events", "n_sessions"]], preserve_index=False
    ).cast(pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                      ("n_sessions", pa.int64())]))


SLIDE_WINDOW_BUCKETS = 3  # trailing window width (current + 2 preceding)


def events_sliding_avg(sf_dir: str) -> Dataset:
    """Sliding-window aggregate: hourly event counts smoothed with a
    trailing 3-bucket mean (ROWS 2 PRECEDING window frame).

    Shape: the heavy part — counting events per bucket — is the
    distributed pre-aggregated groupby; the window pass then runs over the
    POST-AGGREGATE series, which is tiny at any input scale (one row per
    hour: years of data ≈ 10^5 rows), so it executes as one
    ``repartition(1)`` block with a vectorized pandas rolling mean. The
    brief's streaming-window class, restated for a batch table."""
    ds = _events(sf_dir, ["ts"])
    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"width_s": 3600},
    ).select_columns(["bucket_ts"])
    counts = grouped_count(bucketed, ["bucket_ts"]).sort("bucket_ts")
    series = counts.repartition(1)
    return series.map_batches(
        _sliding_avg_block, batch_format="pandas", batch_size=None
    )


def _sliding_avg_block(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return pd.DataFrame(
            {
                "bucket_ts": pd.Series([], dtype="datetime64[ns]"),
                "cnt": pd.Series([], dtype="int64"),
                "avg_cnt": pd.Series([], dtype="float64"),
            }
        )
    df = df.sort_values("bucket_ts").reset_index(drop=True)
    df["avg_cnt"] = (
        df["cnt"].rolling(SLIDE_WINDOW_BUCKETS, min_periods=1).mean()
    )
    return df[["bucket_ts", "cnt", "avg_cnt"]]


# --- hash join against a dimension table -------------------------------------

def events_by_segment(sf_dir: str) -> Dataset:
    """Events joined to the customer dimension (user_id = c_custkey) and
    counted per market segment — ``Dataset.join`` hash-partitioned on the
    key; inner join drops events without a matching customer.

    Scale note: for a truly small dimension the broadcast pattern
    (stages/enrich.py) is cheaper; this operator exists to cover the
    both-sides-large join shape."""
    import ray
    import ray.data

    events = _events(sf_dir, ["event_id", "user_id"])
    customers = ray.data.read_parquet(
        str(Path(sf_dir) / "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    joined = events.join(
        customers, join_type="inner",
        # cpus//4 like every keyed exchange here: 1-CPU join aggregators at
        # n==cpus mostly pay spin-up at query-sized inputs
        num_partitions=max(2, int(ray.cluster_resources().get("CPU", 8)) // 4),
        on=("user_id",), right_on=("c_custkey",),
    )
    return grouped_count(
        joined.select_columns(["c_mktsegment"]), ["c_mktsegment"]
    ).sort("c_mktsegment")  # deterministic driver-hash order


# --- broadcast semi-join ------------------------------------------------------

FLAGGED_BROADCAST_MAX = 1_000_000  # flagged-key set broadcast below this


def flagged_conv_turns(sf_dir: str) -> Dataset:
    """Turn counts of conversations containing ≥1 auth failure. The flagged
    conv_id set is distinct-aggregated DISTRIBUTED first; if small (the
    documented common case) it is broadcast and the big side filters inside
    map_batches — a semi-join with no shuffle of the big side. Above
    FLAGGED_BROADCAST_MAX distinct keys it falls back to a hash-partitioned
    inner join, so an adversarial input can not land an unbounded key set
    on the driver."""
    import ray

    flagged_ds = read_transcripts(sf_dir, columns=["conv_id", "text"]).map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity", "message", "event"),
                       require=(("event", "auth_failure"),),
                       keep=("conv_id",)),
    )
    distinct = (
        grouped_count(flagged_ds, ["conv_id"])
        .select_columns(["conv_id"])
        .materialize()
    )
    n_flagged = distinct.count()
    turns = read_transcripts(sf_dir, columns=["conv_id"])
    if n_flagged <= FLAGGED_BROADCAST_MAX:
        flagged_ref = ray.put(set(distinct.to_pandas()["conv_id"]))
        turns = turns.map_batches(
            _filter_conv_set, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"conv_set_ref": flagged_ref},
        )
    else:
        turns = turns.join(
            distinct, join_type="inner", on=("conv_id",),
            num_partitions=max(
                2, int(ray.cluster_resources().get("CPU", 8)) // 4
            ),
        )
    return grouped_count(turns, ["conv_id"]
                         ).sort("conv_id")  # deterministic driver-hash order


def _filter_conv_set(batch: pa.Table, conv_set_ref) -> pa.Table:
    import ray

    conv_set = (
        ray.get(conv_set_ref)
        if isinstance(conv_set_ref, ray.ObjectRef) else conv_set_ref
    )
    keys = pa.array(sorted(conv_set), type=pa.string())
    mask = pc.is_in(batch["conv_id"], value_set=keys)
    return batch.filter(pc.fill_null(mask, False))


# --- peaks (reference: unimplemented) ----------------------------------------

def peaks(sf_dir: str, width_s: int = 600, k: int = 10) -> Dataset:
    """Busiest time periods by record count (main.rs:147 stub made real):
    10-min buckets over ALL records, top-k desc, bucket asc on ties."""
    ds = read_transcripts(sf_dir, columns=["text", "ts"])
    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"width_s": width_s},
    ).select_columns(["bucket_ts"])
    counts = grouped_count(bucketed, ["bucket_ts"])
    return counts.sort(["cnt", "bucket_ts"], descending=[True, False]).limit(k)


# --- stats (reference: unimplemented) ----------------------------------------

def stats(sf_dir: str) -> pd.DataFrame:
    """One-row log summary (cli.rs:92-96 help text made real): counts of
    records, errors, fatals, slow statements (>1 s), connection attempts,
    locking and system events."""
    ds = read_transcripts(sf_dir, columns=["text"])
    partials = ds.map_batches(
        _stats_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cols = ["records", "errors", "fatals", "slow_1s", "conn_attempts",
            "lock_events", "system_events"]
    return pd.DataFrame([global_sums(partials, cols)])


def _stats_partial(batch: pa.Table) -> pa.Table:
    batch = parse_table(
        batch,
        groups=("severity", "message", "duration", "event", "locks", "system"),
    )

    def n(mask):
        return pa.array(
            [pc.sum(pc.cast(pc.fill_null(mask, False), pa.int64())).as_py() or 0],
            type=pa.int64(),
        )

    return pa.table(
        {
            "records": pa.array([batch.num_rows], type=pa.int64()),
            "errors": n(pc.equal(batch["severity"], "error")),
            "fatals": n(pc.equal(batch["severity"], "fatal")),
            "slow_1s": n(pc.greater(batch["duration_ms"], 1000.0)),
            "conn_attempts": n(pc.equal(batch["event"], "received")),
            "lock_events": n(batch["is_lock"]),
            "system_events": n(batch["is_system"]),
        }
    )


# --- as-of join --------------------------------------------------------------

ASOF_LEFT_TYPE = "error"    # each error event looks back for ...
ASOF_RIGHT_TYPE = "click"   # ... the user's most recent click

_ASOF_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()),
     ("ts", pa.timestamp("us")), ("prior_event_id", pa.int64()),
     ("gap_us", pa.int64())]
)


def _asof_types_only(batch: pa.Table) -> pa.Table:
    return batch.filter(
        pc.is_in(batch["event_type"],
                 value_set=pa.array([ASOF_LEFT_TYPE, ASOF_RIGHT_TYPE]))
    )


def _asof_block(batch: pa.Table) -> pa.Table:
    """As-of join inside one user-exclusive partition: pandas merge_asof
    (vectorized backward search) pairs each left row with the right row of
    greatest ts <= left.ts; right pre-sorted (ts, event_id) so equal-ts
    ties resolve to the max event_id — the same deterministic pick the
    oracle's ORDER BY ts DESC, event_id DESC makes."""
    if batch.num_rows == 0:
        return _ASOF_SCHEMA.empty_table()
    df = batch.to_pandas()
    left = (
        df[df["event_type"] == ASOF_LEFT_TYPE]
        .sort_values(["ts", "event_id"])[["event_id", "user_id", "ts"]]
    )
    if not len(left):
        return _ASOF_SCHEMA.empty_table()
    right = (
        df[df["event_type"] == ASOF_RIGHT_TYPE]
        .sort_values(["ts", "event_id"])[["ts", "user_id", "event_id"]]
        .rename(columns={"event_id": "prior_event_id"})
    )
    right = right.assign(pts=right["ts"])  # carry matched ts as payload
    out = pd.merge_asof(
        left, right, on="ts", by="user_id",
        direction="backward", allow_exact_matches=True,
    )
    has = out["prior_event_id"].notna().to_numpy()
    out["prior_event_id"] = out["prior_event_id"].fillna(-1).astype("int64")
    gap_us = pd.Series(-1, index=out.index, dtype="int64")
    gap_us[has] = (
        (out.loc[has, "ts"].to_numpy() - out.loc[has, "pts"].to_numpy())
        .astype("timedelta64[us]").astype("int64")
    )
    out["gap_us"] = gap_us
    out = out[["event_id", "user_id", "ts", "prior_event_id", "gap_us"]]
    return pa.Table.from_pandas(out, preserve_index=False).cast(_ASOF_SCHEMA)


def events_asof_prior(sf_dir: str) -> Dataset:
    """AS-OF JOIN — for every 'error' event, the same user's most recent
    'click' event at-or-before it, plus the gap in microseconds (-1 / -1
    when none exists). Ray Data has no as-of join operator; per the graft
    brief's custom-operator rule it composes as hash-partition by the `by`
    key (user-exclusive keyed blocks, no per-group Python dispatch) + one
    vectorized pandas merge_asof per block. Partitioning assumption: one
    user's filtered events fit one worker (salt by time range for
    pathological users). Scale shape: only the two event types survive the
    pre-filter, so the one shuffle moves the joined minority, never the
    full stream."""
    from .dataprep import _keyed_blocks

    ev = _events(
        sf_dir, ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(
        _asof_types_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _keyed_blocks(ev, ["user_id"], _asof_block
                         ).sort("event_id")  # deterministic driver-hash order

# --- bucketed range join -------------------------------------------------------

RJ_WINDOW_S = 600           # each anchor opens a [ts, ts+600s) window
RJ_ANCHOR_TYPE = "purchase"  # window-defining events
RJ_ERR_TYPE = "error"        # separately counted inside each window
_RJ_B_US = RJ_WINDOW_S * 1_000_000  # bucket width == window width (load-bearing)

_RJ_TAG_SCHEMA = pa.schema(
    [("bucket", pa.int64()), ("kind", pa.int8()), ("ts_us", pa.int64()),
     ("wid", pa.int64()), ("is_err", pa.int8())]
)

_RJ_OUT_SCHEMA = pa.schema(
    [("window_id", pa.int64()), ("n_in_window", pa.int64()),
     ("n_errors", pa.int64())]
)


def _rj_tag(batch: pa.Table) -> pa.Table:
    """One vectorized pass over an events batch → the tagged rows the range
    join shuffles. PROBE rows (kind=0) are replicated to time buckets k and
    k-1 (k = ts // B): with bucket width == window width, every window
    anchored in bucket k lies inside [kB, (k+2)B), so the two probe copies
    make each bucket's block self-sufficient — the join completes in ONE
    shuffle with no per-window second aggregation. WINDOW rows (kind=1) go
    to their anchor's own bucket only."""
    import numpy as np

    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    etype = batch["event_type"].to_numpy(zero_copy_only=False)
    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    k0 = ts // _RJ_B_US
    is_err = (etype == RJ_ERR_TYPE).astype(np.int8)
    anchor = etype == RJ_ANCHOR_TYPE
    n = len(ts)
    bucket = np.concatenate([k0, k0 - 1, k0[anchor]])
    kind = np.concatenate(
        [np.zeros(2 * n, dtype=np.int8), np.ones(int(anchor.sum()), np.int8)]
    )
    ts_us = np.concatenate([ts, ts, ts[anchor]])
    wid = np.concatenate(
        [np.full(2 * n, -1, dtype=np.int64), eid[anchor]]
    )
    err = np.concatenate([is_err, is_err, np.zeros(int(anchor.sum()), np.int8)])
    return pa.table(
        {"bucket": bucket, "kind": kind, "ts_us": ts_us, "wid": wid,
         "is_err": err}, schema=_RJ_TAG_SCHEMA,
    )


def _rj_block(batch: pa.Table) -> pa.Table:
    """Range-join kernel for one hash partition (many whole buckets): the
    composite key B*bucket + ts_us is strictly ordered by (bucket, ts-within
    -bucket) because every probe's ts sits in [bucket*B, (bucket+2)*B) — so
    a window's [lo, lo+B) key range never crosses into another bucket's key
    range, and the whole partition joins with two vectorized searchsorteds
    over ONE sorted array (no per-bucket Python loop)."""
    import numpy as np

    if batch.num_rows == 0:
        return _RJ_OUT_SCHEMA.empty_table()
    bucket = batch["bucket"].to_numpy(zero_copy_only=False)
    kind = batch["kind"].to_numpy(zero_copy_only=False)
    ts_us = batch["ts_us"].to_numpy(zero_copy_only=False)
    key = bucket * _RJ_B_US + ts_us
    probes = kind == 0
    pk = key[probes]
    order = np.argsort(pk, kind="stable")
    pk = pk[order]
    ek = pk[batch["is_err"].to_numpy(zero_copy_only=False)[probes][order] == 1]
    w = kind == 1
    if not w.any():
        return _RJ_OUT_SCHEMA.empty_table()
    lo = key[w]
    hi = lo + _RJ_B_US
    n_in = np.searchsorted(pk, hi, "left") - np.searchsorted(pk, lo, "left")
    n_err = np.searchsorted(ek, hi, "left") - np.searchsorted(ek, lo, "left")
    return pa.table(
        {"window_id": batch["wid"].to_numpy(zero_copy_only=False)[w],
         "n_in_window": n_in.astype(np.int64),
         "n_errors": n_err.astype(np.int64)}, schema=_RJ_OUT_SCHEMA,
    )


def events_range_join(sf_dir: str) -> Dataset:
    """RANGE (interval) JOIN — for every 'purchase' event, how many events
    of any type and how many 'error' events fall inside its
    [ts, ts+RJ_WINDOW_S) window. Ray Data has no range-join operator; per
    the graft brief's custom-operator rule it composes as the classic
    bucket-replication join: probes duplicated to the two buckets that can
    see them (bucket width == window width), windows hash-partitioned to
    their own bucket, one co-partitioned searchsorted kernel — one shuffle,
    2x probe replication, zero driver-side state.

    Partitioning assumption (documented per the brief): windows no wider
    than the bucket; a hot bucket (rate spike) is bounded by B seconds of
    stream — for extreme rates, salt windows into S sub-buckets and
    replicate probes S-fold within the hot bucket only."""
    from .dataprep import _keyed_blocks

    tagged = _events(
        sf_dir, ["event_id", "ts", "event_type"]
    ).map_batches(
        _rj_tag, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _keyed_blocks(tagged, ["bucket"], _rj_block).sort("window_id")


# --- tool-transition bigrams ---------------------------------------------------

def _transitions_block(batch: pa.Table) -> pa.Table:
    """Per-conv consecutive-turn tool pairs for one conv-exclusive
    partition: one lexsort + one shifted compare over the whole block, then
    a per-block pre-aggregated pair count (the shuffle downstream moves
    (from_tool, to_tool, cnt) partials only)."""
    import numpy as np

    empty = pa.table({"from_tool": pa.array([], type=pa.string()),
                      "to_tool": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    if batch.num_rows < 2:
        return empty
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    tool = batch["tool"].to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv))
    conv, tool = conv[order], tool[order]
    same = conv[1:] == conv[:-1]
    if not same.any():
        return empty
    pairs = pa.table({
        "from_tool": pa.array(tool[:-1][same], type=pa.string()),
        "to_tool": pa.array(tool[1:][same], type=pa.string()),
    })
    agg = pairs.group_by(["from_tool", "to_tool"]).aggregate(
        [([], "count_all")]
    )
    return agg.rename_columns(["from_tool", "to_tool", "cnt"])


def _sum_pairs_block(t: pa.Table) -> pa.Table:
    agg = t.group_by(["from_tool", "to_tool"]).aggregate([("cnt", "sum")])
    return agg.rename_columns(["from_tool", "to_tool", "cnt"])


def conv_tool_transitions(sf_dir: str) -> Dataset:
    """Markov transition counts between the tools of CONSECUTIVE turns
    within each conversation (ordered by turn_idx) — the
    behavioral-sequence operator of a transcript pipeline.

    Shape: keyed hash repartition on conv_id (the skew-sensitive key —
    same assumption as core.sessions: one conversation fits one block),
    vectorized shift-compare per block, per-block pre-aggregation, then a
    two-level TREE block-sum over the pair partials. The tree (not a
    second keyed groupby) is deliberate twice over: the result is bounded
    at |tools|² rows so no key needs its own reducer, and a groupby chained
    onto a _keyed_blocks output would execute under the snapshotted
    HASH_SHUFFLE context — measured 97 s vs 3.4 s at sf0.001 for this
    exact pipeline — while non-keyed repartitions are strategy-neutral."""
    import ray

    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "tool"]
    ).materialize()
    partials = _keyed_blocks(ds, ["conv_id"], _transitions_block)
    n_mid = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    mid = partials.repartition(n_mid).map_batches(
        _sum_pairs_block, batch_format="pyarrow", batch_size=None
    )
    return mid.repartition(1).map_batches(
        _sum_pairs_block, batch_format="pyarrow", batch_size=None
    ).sort(["from_tool", "to_tool"])  # deterministic driver-hash order


# --- PageRank over the tool-transition graph ----------------------------------

PR_SCALE = 10**12        # fixed-point total rank mass
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping factor 0.85 as a ratio
PR_ITERS = 4


def conv_tool_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the tool-transition graph: nodes are tools, edge
    weights are the consecutive-turn transition counts of
    :func:`conv_tool_transitions` — "which tools does activity flow
    into" as a stationary-ish score rather than raw in-degree.

    Scale shape: the DISTRIBUTED stage is the edge aggregation (every
    consecutive turn pair of a 100 TB corpus feeds it, conv-exclusive
    keyed blocks, pre-aggregated partials); the power iteration then runs
    over the BOUNDED |tools|² edge table — microseconds next to the turn
    scan, and deliberately driver-side because no iteration state exceeds
    the node count. Arithmetic is fixed-point PYTHON-INT (never numpy
    int64): rank·weight products overflow 2^63 at realistic edge counts,
    and the oracle's chained-CTE replay casts to HUGEINT for the same
    reason. Every operation is a floor division, so all PR_ITERS iterates
    are bit-exact against the SQL."""
    edges = conv_tool_transitions(sf_dir).to_pandas()
    return pagerank_ranks(
        list(zip(edges["from_tool"], edges["to_tool"], edges["cnt"]))
    )


def pagerank_ranks(edges: list[tuple[str, str, int]]) -> pd.DataFrame:
    """The fixed-point power iteration on a BOUNDED edge list (pure —
    conv_tool_pagerank feeds it the distributed transition counts)."""
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"tool": pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype="int64")})
    idx = {t: i for i, t in enumerate(nodes)}
    ew = [(idx[a], idx[b], int(c)) for a, b, c in edges]
    outdeg = [0] * n
    for s, _, c in ew:
        outdeg[s] += c
    r = [PR_SCALE // n] * n
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * n)
    for _ in range(PR_ITERS):
        contrib = [0] * n
        for s, d, c in ew:
            contrib[d] += (r[s] * c) // outdeg[s]
        dangling = sum(r[v] for v in range(n) if outdeg[v] == 0)
        r = [base + PR_DAMP_NUM * (contrib[v] + dangling // n) // PR_DAMP_DEN
             for v in range(n)]
    out = pd.DataFrame({"tool": nodes, "rank": pd.array(r, dtype="int64")})
    return out.sort_values("tool").reset_index(drop=True)


# --- HITS hubs/authorities over the tool-transition graph -----------------------

HITS_ITERS = 2
HITS_SCALE = 10**6   # integer renormalization ceiling after every half-step


def hits_scores(edges: list[tuple[str, str, int]]) -> pd.DataFrame:
    """HITS power iteration on a BOUNDED edge list, all-integer: authority
    a(v) = Σ_{u→v} w·h(u), hub h(v) = Σ_{v→u} w·a(u), each half-step
    renormalized to max = HITS_SCALE by an exact floor division (keeps
    every product inside HUGEINT/Python-int range at any edge weight —
    and makes the iterates bit-replayable in SQL). Ties and zero rows are
    exact, no floats anywhere."""
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"tool": pd.Series([], dtype=object),
                             "hub": pd.Series([], dtype="int64"),
                             "authority": pd.Series([], dtype="int64")})
    idx = {t: i for i, t in enumerate(nodes)}
    ew = [(idx[a], idx[b], int(c)) for a, b, c in edges]

    def norm(x):
        m = max(x)
        return [v * HITS_SCALE // m for v in x] if m > 0 else x

    h = [HITS_SCALE] * n
    a = [0] * n
    for _ in range(HITS_ITERS):
        a = [0] * n
        for s, d, c in ew:
            a[d] += c * h[s]
        a = norm(a)
        h = [0] * n
        for s, d, c in ew:
            h[s] += c * a[d]
        h = norm(h)
    return pd.DataFrame({
        "tool": nodes,
        "hub": pd.array(h, dtype="int64"),
        "authority": pd.array(a, dtype="int64"),
    }).sort_values("tool").reset_index(drop=True)


def conv_tool_hits(sf_dir: str) -> pd.DataFrame:
    """HITS over the tool-transition graph — hubs (tools activity flows
    OUT of) and authorities (tools it flows INTO), the directional
    complement of :func:`conv_tool_pagerank`. Same scale shape: the
    distributed stage is the transition-count edge aggregation over every
    consecutive turn pair; the iteration runs on the bounded |tools|²
    table in exact integer arithmetic (floor-renormalized half-steps),
    bit-replayed by the oracle's chained HUGEINT CTEs."""
    edges = conv_tool_transitions(sf_dir).to_pandas()
    return hits_scores(
        list(zip(edges["from_tool"], edges["to_tool"], edges["cnt"]))
    )


# --- response latency + role balance (transcript conversational analytics) ----

_LAT_SCHEMA = pa.schema([
    ("tool", pa.string()), ("n_resp", pa.int64()),
    ("sum_lat_us", pa.int64()), ("min_lat_us", pa.int64()),
    ("max_lat_us", pa.int64()),
])


def _latency_block(batch: pa.Table) -> pa.Table:
    """user→assistant consecutive-turn latencies for one conv-exclusive
    partition: lexsort + shifted role compare (same shape as
    _transitions_block), then per-tool integer-µs partials so the
    downstream shuffle moves ≤|tools| rows per block."""
    import numpy as np

    empty = _LAT_SCHEMA.empty_table()
    if batch.num_rows < 2:
        return empty
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    role = batch["role"].to_numpy(zero_copy_only=False)
    tool = batch["tool"].to_numpy(zero_copy_only=False)
    ts_us = batch["ts"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").view("int64")
    order = np.lexsort((turn, conv))
    conv, role, tool, ts_us = (
        conv[order], role[order], tool[order], ts_us[order]
    )
    mask = (conv[1:] == conv[:-1]) \
        & (role[:-1] == "user") & (role[1:] == "assistant")
    if not mask.any():
        return empty
    pairs = pa.table({
        "tool": pa.array(tool[1:][mask], type=pa.string()),
        "lat": pa.array(ts_us[1:][mask] - ts_us[:-1][mask],
                        type=pa.int64()),
    })
    agg = pairs.group_by(["tool"]).aggregate(
        [("lat", "count"), ("lat", "sum"), ("lat", "min"), ("lat", "max")]
    )
    return agg.rename_columns(
        ["tool", "n_resp", "sum_lat_us", "min_lat_us", "max_lat_us"]
    ).cast(_LAT_SCHEMA)


def _merge_latency_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _LAT_SCHEMA.empty_table()
    agg = t.group_by(["tool"]).aggregate(
        [("n_resp", "sum"), ("sum_lat_us", "sum"),
         ("min_lat_us", "min"), ("max_lat_us", "max")]
    )
    return agg.rename_columns(
        ["tool", "n_resp", "sum_lat_us", "min_lat_us", "max_lat_us"]
    ).cast(_LAT_SCHEMA)


def conv_response_latency(sf_dir: str) -> Dataset:
    """Assistant response latency per tool: for every consecutive
    user→assistant turn pair within a conversation (ordered by turn_idx),
    the µs gap between the two timestamps, aggregated per responding
    assistant turn's tool — the conversational-SLA counterpart of the
    reference's slow-statement report (duration.rs / `pgweasel slow`),
    re-expressed over the transcript axis.

    Scale shape: identical to conv_tool_transitions — conv-exclusive keyed
    blocks, one lexsort + shifted compare per partition, per-block
    pre-aggregated integer-µs partials (count/sum/min/max are all
    mergeable), two-level tree block-sum over the ≤|tools|-row partials.
    All-int64 output for bit-exact oracle parity."""
    import ray

    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "role", "tool", "ts"]
    ).materialize()
    partials = _keyed_blocks(ds, ["conv_id"], _latency_block)
    n_mid = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    mid = partials.repartition(n_mid).map_batches(
        _merge_latency_block, batch_format="pyarrow", batch_size=None
    )
    return mid.repartition(1).map_batches(
        _merge_latency_block, batch_format="pyarrow", batch_size=None
    ).sort("tool")


_ROLE_CONV_SCHEMA = pa.schema([
    ("role", pa.string()), ("conv_id", pa.string()),
    ("n_turns", pa.int64()), ("sum_chars", pa.int64()),
    ("max_chars", pa.int64()),
])

_ROLE_SCHEMA = pa.schema([
    ("role", pa.string()), ("n_convs", pa.int64()),
    ("n_turns", pa.int64()), ("sum_chars", pa.int64()),
    ("max_chars", pa.int64()),
])


def _role_conv_partials(batch: pa.Table) -> pa.Table:
    """Per-(role, conv_id) pre-aggregation inside each read block — the
    combiner that bounds the shuffle at |roles|·|convs-per-block| rows."""
    if batch.num_rows == 0:
        return _ROLE_CONV_SCHEMA.empty_table()
    chars = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
    t = pa.table({
        "role": batch["role"], "conv_id": batch["conv_id"], "chars": chars,
    })
    agg = t.group_by(["role", "conv_id"]).aggregate(
        [("chars", "count"), ("chars", "sum"), ("chars", "max")]
    )
    return agg.rename_columns(
        ["role", "conv_id", "n_turns", "sum_chars", "max_chars"]
    ).cast(_ROLE_CONV_SCHEMA)


def _role_partials_block(batch: pa.Table) -> pa.Table:
    """One (role, conv_id)-exclusive partition → per-role partials. The
    exclusivity makes the distinct-conv count EXACT: each (role, conv)
    pair is finalized here and contributes 1 to n_convs exactly once."""
    if batch.num_rows == 0:
        return _ROLE_SCHEMA.empty_table()
    merged = batch.group_by(["role", "conv_id"]).aggregate(
        [("n_turns", "sum"), ("sum_chars", "sum"), ("max_chars", "max")]
    ).rename_columns(
        ["role", "conv_id", "n_turns", "sum_chars", "max_chars"]
    )
    agg = merged.group_by(["role"]).aggregate(
        [("conv_id", "count"), ("n_turns", "sum"),
         ("sum_chars", "sum"), ("max_chars", "max")]
    )
    return agg.rename_columns(
        ["role", "n_convs", "n_turns", "sum_chars", "max_chars"]
    ).cast(_ROLE_SCHEMA)


def _merge_role_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _ROLE_SCHEMA.empty_table()
    agg = t.group_by(["role"]).aggregate(
        [("n_convs", "sum"), ("n_turns", "sum"),
         ("sum_chars", "sum"), ("max_chars", "max")]
    )
    return agg.rename_columns(
        ["role", "n_convs", "n_turns", "sum_chars", "max_chars"]
    ).cast(_ROLE_SCHEMA)


def conv_role_balance(sf_dir: str) -> Dataset:
    """Per-role conversational composition: turn count, EXACT distinct
    conversation count, and character-volume stats — the
    corpus-composition report a transcript pipeline runs before training
    (role mix and message-size budget per role).

    Scale shape: the exact distinct-count is a two-phase combiner, never a
    global distinct shuffle of raw turns — (1) per-block pre-aggregation
    to (role, conv_id) partials, (2) hash-partition on (role, conv_id) so
    each pair is finalized in exactly one partition (count there = exact
    distinct), (3) tree block-sum over ≤|roles|-row partials."""
    import ray

    from .dataprep import _keyed_blocks

    ds = read_transcripts(sf_dir, columns=["conv_id", "role", "text"])
    partials = ds.map_batches(
        _role_conv_partials, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    role_partials = _keyed_blocks(
        partials, ["role", "conv_id"], _role_partials_block
    )
    n_mid = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    mid = role_partials.repartition(n_mid).map_batches(
        _merge_role_block, batch_format="pyarrow", batch_size=None
    )
    return mid.repartition(1).map_batches(
        _merge_role_block, batch_format="pyarrow", batch_size=None
    ).sort("role")


# --- context-window analytics (per-conv ordered prefix scans) ------------------

_CTX_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int64()),
    ("n_chars", pa.int64()), ("cum_chars", pa.int64()),
])


def _context_growth_block(batch: pa.Table) -> pa.Table:
    """Segmented prefix sum over one conv-exclusive partition: lexsort by
    (conv_id, turn_idx), one np.cumsum, then subtract each segment's
    pre-start total — no per-conv Python loop."""
    import numpy as np

    if batch.num_rows == 0:
        return _CTX_SCHEMA.empty_table()
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    chars = pc.cast(
        pc.utf8_length(batch["text"]), pa.int64()
    ).to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv))
    conv, turn, chars = conv[order], turn[order], chars[order]
    cum = np.cumsum(chars)
    starts = np.flatnonzero(
        np.concatenate(([True], conv[1:] != conv[:-1]))
    )
    # total BEFORE each segment start, repeated across the segment
    base = cum[starts] - chars[starts]
    seg_id = np.cumsum(
        np.concatenate(([0], (conv[1:] != conv[:-1]).astype(np.int64)))
    )
    cum_chars = cum - base[seg_id]
    return pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(turn, type=pa.int64()),
        "n_chars": pa.array(chars, type=pa.int64()),
        "cum_chars": pa.array(cum_chars, type=pa.int64()),
    }).cast(_CTX_SCHEMA)


def conv_context_growth(sf_dir: str) -> Dataset:
    """Per-turn context growth: running character total of the conversation
    up to and including each turn — the context-length budget curve an LLM
    serving/training pipeline computes before packing or truncation.

    Scale shape: map-cardinality output (one row per turn); one hash
    partition by conv_id (the minimal co-location the ordered prefix scan
    needs), then a single vectorized segmented cumsum per partition.
    All-int64 measures for bit-exact oracle parity."""
    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "text"]
    ).materialize()
    out = _keyed_blocks(ds, ["conv_id"], _context_growth_block)
    return out.sort(["conv_id", "turn_idx"])


CTX_BUDGET_TOKENS = 256  # suffix token budget for context truncation

_TRUNC_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("n_turns", pa.int64()),
    ("n_kept", pa.int64()), ("kept_tokens", pa.int64()),
    ("first_kept_turn", pa.int64()),
])


def _truncate_block(batch: pa.Table, budget: int) -> pa.Table:
    """Context-window truncation for one conv-exclusive partition: keep the
    longest SUFFIX of each conversation whose total whitespace-token count
    fits ``budget`` (the keep-recent-turns rule serving stacks apply).
    Vectorized: reversed segmented cumsum + reduceat per segment."""
    import numpy as np

    if batch.num_rows == 0:
        return _TRUNC_SCHEMA.empty_table()
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = pc.cast(
        pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
    ).to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv))
    conv, turn, toks = conv[order], turn[order], toks[order]
    # reversed view: suffix sums become prefix sums of the flipped arrays
    rconv, rturn, rtoks = conv[::-1], turn[::-1], toks[::-1]
    rcum = np.cumsum(rtoks)
    rstarts = np.flatnonzero(
        np.concatenate(([True], rconv[1:] != rconv[:-1]))
    )
    rbase = rcum[rstarts] - rtoks[rstarts]
    rseg = np.cumsum(
        np.concatenate(([0], (rconv[1:] != rconv[:-1]).astype(np.int64)))
    )
    suffix_total = rcum - rbase[rseg]          # tokens from this turn to end
    kept = suffix_total <= budget
    n_turns = np.add.reduceat(np.ones_like(rtoks), rstarts)
    n_kept = np.add.reduceat(kept.astype(np.int64), rstarts)
    kept_tokens = np.add.reduceat(np.where(kept, rtoks, 0), rstarts)
    # first kept turn = min turn_idx among kept rows per segment; -1 if none
    first_kept = np.minimum.reduceat(
        np.where(kept, rturn, np.iinfo(np.int64).max), rstarts
    )
    first_kept = np.where(n_kept > 0, first_kept, -1)
    return pa.table({
        "conv_id": pa.array(rconv[rstarts], type=pa.string()),
        "n_turns": pa.array(n_turns, type=pa.int64()),
        "n_kept": pa.array(n_kept, type=pa.int64()),
        "kept_tokens": pa.array(kept_tokens, type=pa.int64()),
        "first_kept_turn": pa.array(first_kept, type=pa.int64()),
    }).cast(_TRUNC_SCHEMA)


def conv_truncate_context(sf_dir: str) -> Dataset:
    """Context-window truncation report: per conversation, how many of its
    most recent turns fit a CTX_BUDGET_TOKENS whitespace-token budget
    (longest suffix with total tokens <= budget), how many tokens those
    kept turns carry, and where the kept window starts (-1 when even the
    final turn alone exceeds the budget).

    Scale shape: identical to conv_context_growth — one hash partition by
    conv_id, one vectorized reversed-cumsum pass per partition, one
    bounded (|convs|-row) output."""
    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "text"]
    ).materialize()
    out = _keyed_blocks(
        ds, ["conv_id"], _truncate_block,
        fn_kwargs={"budget": CTX_BUDGET_TOKENS},
    )
    return out.sort("conv_id")


CONV_SPLIT_GAP_US = 4_500_000  # ts gap that splits a conversation into
                               # sessions (fixture gaps span 1-6 s)

_SPLIT_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("n_turns", pa.int64()),
    ("n_sessions", pa.int64()), ("max_gap_us", pa.int64()),
    ("span_us", pa.int64()),
])


def _session_splits_block(batch: pa.Table, gap_us: int) -> pa.Table:
    """Gap-based session splitting for one conv-exclusive partition:
    lexsort by (conv_id, turn_idx), consecutive-ts diffs within each conv,
    per-conv reduceat over the split mask. max_gap_us is -1 for
    single-turn conversations (no gap exists)."""
    import numpy as np

    if batch.num_rows == 0:
        return _SPLIT_SCHEMA.empty_table()
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    ts_us = batch["ts"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").view("int64")
    order = np.lexsort((turn, conv))
    conv, ts_us = conv[order], ts_us[order]
    same = np.concatenate(([False], conv[1:] == conv[:-1]))
    gap = np.concatenate(([0], ts_us[1:] - ts_us[:-1]))
    starts = np.flatnonzero(~same)
    counts = np.diff(np.append(starts, conv.size))
    splits = same & (gap > gap_us)
    n_sessions = 1 + np.add.reduceat(splits.astype(np.int64), starts)
    gaps_masked = np.where(same, gap, np.int64(-1))
    max_gap = np.maximum.reduceat(gaps_masked, starts)
    span = (np.maximum.reduceat(ts_us, starts)
            - np.minimum.reduceat(ts_us, starts))
    return pa.table({
        "conv_id": pa.array(conv[starts], type=pa.string()),
        "n_turns": pa.array(counts, type=pa.int64()),
        "n_sessions": pa.array(n_sessions, type=pa.int64()),
        "max_gap_us": pa.array(max_gap, type=pa.int64()),
        "span_us": pa.array(span, type=pa.int64()),
    }).cast(_SPLIT_SCHEMA)


def conv_session_splits(sf_dir: str) -> Dataset:
    """Gap-based session splitting of conversations: per conv_id, how many
    sessions a CONV_SPLIT_GAP_US idle-gap rule produces, the largest
    inter-turn gap, and the total time span — the transcript-axis
    counterpart of the events-stream sessionization (`events_user_sessions`),
    computed with the same split-count shape.

    Scale shape: one hash partition by conv_id, one vectorized
    lexsort+diff+reduceat pass per partition, bounded |convs|-row output,
    all-int64 measures (gaps/spans in integer µs)."""
    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "ts"]
    ).materialize()
    out = _keyed_blocks(
        ds, ["conv_id"], _session_splits_block,
        fn_kwargs={"gap_us": CONV_SPLIT_GAP_US},
    )
    return out.sort("conv_id")


LOOP_RUN_MIN = 3  # a run of >= this many consecutive same-tool calls is a loop

_LOOP_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("n_assist", pa.int64()),
    ("n_tool_calls", pa.int64()), ("max_run", pa.int64()),
    ("n_loops", pa.int64()),
])


def _loop_detect_block(batch: pa.Table, run_min: int) -> pa.Table:
    """Tool-loop runs for one conv-exclusive partition: filter to assistant
    turns, lexsort by (conv_id, turn_idx), segment maximal runs of
    consecutive identical non-null tools, then per-conv reduceat over the
    run-length axis (runs arrive in conv order, so conv groups of runs are
    contiguous). A null tool breaks a run and joins none."""
    import numpy as np

    if batch.num_rows == 0:
        return _LOOP_SCHEMA.empty_table()
    t = batch.filter(pc.equal(batch["role"], "assistant"))
    if t.num_rows == 0:
        return _LOOP_SCHEMA.empty_table()
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)
    tool_col = t["tool"].combine_chunks() if isinstance(
        t["tool"], pa.ChunkedArray) else t["tool"]
    has_tool = pc.is_valid(tool_col).to_numpy(zero_copy_only=False)
    tool = tool_col.to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv))
    conv, tool, has_tool = conv[order], tool[order], has_tool[order]

    same_conv = np.concatenate(([False], conv[1:] == conv[:-1]))
    starts = np.flatnonzero(~same_conv)
    n_assist = np.diff(np.append(starts, conv.size))
    n_tool_calls = np.add.reduceat(has_tool.astype(np.int64), starts)
    # n_tool_calls: reduceat over an all-False group still sums that group's
    # slice correctly (slice sums, not first-element picks), so zeros hold.

    same_tool = np.zeros(conv.size, dtype=bool)
    same_tool[1:] = (same_conv[1:] & has_tool[1:] & has_tool[:-1]
                     & (tool[1:] == tool[:-1]))
    run_start = has_tool & ~same_tool
    max_run = np.zeros(starts.size, dtype=np.int64)
    n_loops = np.zeros(starts.size, dtype=np.int64)
    run_pos = np.flatnonzero(run_start)
    if run_pos.size:
        rid = np.cumsum(run_start) - 1
        run_len = np.bincount(rid[has_tool]).astype(np.int64)
        run_conv = np.searchsorted(starts, run_pos, side="right") - 1
        conv_with_runs, first_run = np.unique(run_conv, return_index=True)
        max_run[conv_with_runs] = np.maximum.reduceat(run_len, first_run)
        n_loops[conv_with_runs] = np.add.reduceat(
            (run_len >= run_min).astype(np.int64), first_run)
    return pa.table({
        "conv_id": pa.array(conv[starts], type=pa.string()),
        "n_assist": pa.array(n_assist, type=pa.int64()),
        "n_tool_calls": pa.array(n_tool_calls, type=pa.int64()),
        "max_run": pa.array(max_run, type=pa.int64()),
        "n_loops": pa.array(n_loops, type=pa.int64()),
    }).cast(_LOOP_SCHEMA)


def conv_loop_detect(sf_dir: str) -> Dataset:
    """Agent-loop detection: per conversation, the longest run of
    consecutive assistant turns invoking the SAME tool (turn_idx order,
    null tools break runs) and how many runs reach LOOP_RUN_MIN — the
    stuck-agent telemetry a transcript pipeline runs before spending
    training budget on looping conversations (the transcript-axis
    counterpart of the reference's repeated-error triage, errors.rs top
    messages). Convs with no assistant turns emit no row.

    Scale shape: identical to conv_session_splits — one hash partition by
    conv_id, one vectorized lexsort+run-segmentation+reduceat pass per
    partition, bounded |convs|-row all-int64 output."""
    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "role", "tool"]
    ).materialize()
    out = _keyed_blocks(
        ds, ["conv_id"], _loop_detect_block,
        fn_kwargs={"run_min": LOOP_RUN_MIN},
    )
    return out.sort("conv_id")


_COST_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("n_assist", pa.int64()),
    ("prompt_chars", pa.int64()), ("gen_chars", pa.int64()),
    ("cost_chars", pa.int64()),
])


def _context_cost_block(batch: pa.Table) -> pa.Table:
    """Quadratic-context cost for one conv-exclusive partition: lexsort by
    (conv_id, turn_idx), segmented exclusive cumsum of char lengths (the
    context each turn is served against), then per-conv reduceat over the
    assistant-turn mask. prompt = context re-read before each assistant
    turn; gen = the assistant turn's own chars."""
    import numpy as np

    if batch.num_rows == 0:
        return _COST_SCHEMA.empty_table()
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    chars = pc.cast(pc.utf8_length(batch["text"]), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    is_assist = pc.equal(batch["role"], "assistant") \
        .to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv))
    conv, chars, is_assist = conv[order], chars[order], is_assist[order]

    same = np.concatenate(([False], conv[1:] == conv[:-1]))
    starts = np.flatnonzero(~same)
    # exclusive running context per conv: global cumsum minus each conv's
    # inclusive-cumsum base at its first row
    inc = np.cumsum(chars)
    base = np.repeat(inc[starts] - chars[starts], np.diff(
        np.append(starts, conv.size)))
    prior = inc - chars - base            # chars BEFORE this turn, this conv

    a = is_assist.astype(np.int64)
    n_assist = np.add.reduceat(a, starts)
    prompt = np.add.reduceat(np.where(is_assist, prior, 0), starts)
    gen = np.add.reduceat(np.where(is_assist, chars, 0), starts)
    return pa.table({
        "conv_id": pa.array(conv[starts], type=pa.string()),
        "n_assist": pa.array(n_assist, type=pa.int64()),
        "prompt_chars": pa.array(prompt, type=pa.int64()),
        "gen_chars": pa.array(gen, type=pa.int64()),
        "cost_chars": pa.array(prompt + gen, type=pa.int64()),
    }).cast(_COST_SCHEMA)


def conv_context_cost(sf_dir: str) -> Dataset:
    """Serving/training cost accounting per conversation under the
    quadratic-context law: each assistant turn re-reads the whole context
    so far (prompt_chars) and emits its own text (gen_chars); cost_chars
    is their sum — the budgeting signal an LLM pipeline uses to price
    conversations before replay/training (long multi-turn convs cost
    far more than their raw size; cf. conv_context_growth, which reports
    the curve this law integrates).

    Scale shape: one hash partition by conv_id, one vectorized
    lexsort + segmented-exclusive-cumsum + reduceat pass per partition,
    bounded |convs|-row all-int64 output."""
    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text"]
    ).materialize()
    out = _keyed_blocks(ds, ["conv_id"], _context_cost_block)
    return out.sort("conv_id")


# --- role→role handoff matrix (dialogue-structure analytics) ---------------------


def _handoffs_block(batch: pa.Table) -> pa.Table:
    """Per-conv consecutive-turn ROLE pairs for one conv-exclusive
    partition — the _transitions_block kernel pointed at the role column:
    one lexsort + one shifted compare, per-block pre-aggregated counts."""
    import numpy as np

    empty = pa.table({"from_role": pa.array([], type=pa.string()),
                      "to_role": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    if batch.num_rows < 2:
        return empty
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    role = batch["role"].to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv))
    conv, role = conv[order], role[order]
    same = conv[1:] == conv[:-1]
    if not same.any():
        return empty
    pairs = pa.table({
        "from_role": pa.array(role[:-1][same], type=pa.string()),
        "to_role": pa.array(role[1:][same], type=pa.string()),
    })
    agg = pairs.group_by(["from_role", "to_role"]).aggregate(
        [([], "count_all")]
    )
    return agg.rename_columns(["from_role", "to_role", "cnt"])


def _sum_handoffs_block(t: pa.Table) -> pa.Table:
    agg = t.group_by(["from_role", "to_role"]).aggregate([("cnt", "sum")])
    return agg.rename_columns(["from_role", "to_role", "cnt"])


def conv_role_handoffs(sf_dir: str) -> Dataset:
    """Markov handoff counts between the ROLES of consecutive turns within
    each conversation — who yields to whom (user→assistant,
    assistant→tool, tool→assistant, …), the dialogue-structure matrix a
    transcript corpus is triaged by before training-mix decisions.

    Shape: identical to conv_tool_transitions (the registry's
    transition-graph exercise) — conv-exclusive keyed blocks, vectorized
    shift-compare, per-block pre-aggregation, then the two-level TREE
    block-sum over pair partials (result bounded at |roles|² rows, so no
    key needs its own reducer and the tree dodges the snapshotted
    HASH_SHUFFLE context a chained groupby would execute under)."""
    import ray

    from .dataprep import _keyed_blocks

    ds = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "role"]
    ).materialize()
    partials = _keyed_blocks(ds, ["conv_id"], _handoffs_block)
    n_mid = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    mid = partials.repartition(n_mid).map_batches(
        _sum_handoffs_block, batch_format="pyarrow", batch_size=None
    )
    return mid.repartition(1).map_batches(
        _sum_handoffs_block, batch_format="pyarrow", batch_size=None
    ).sort(["from_role", "to_role"])  # deterministic driver-hash order
