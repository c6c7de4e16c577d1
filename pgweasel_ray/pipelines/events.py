"""Event-stream pipelines over the driver's native ``events`` table
(event_id, ts, user_id, event_type, value, props) — the same histogram /
grouped-count operators as the transcript pipelines (SURVEY.md §2.4 A2),
exercised against a second source so the aggregate layer is not
fixture-coupled."""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

from ..stages.parse import add_bucket
from .common import grouped_count


def _events(sf_dir: str, columns: list[str]) -> Dataset:
    import ray.data

    return ray.data.read_parquet(
        str(Path(sf_dir) / "events.parquet"), columns=columns
    )


def events_per_hour(sf_dir: str) -> Dataset:
    """Events per 1-h epoch-floored bucket (histogram operator A2 on the
    events stream)."""
    ds = _events(sf_dir, ["ts"])
    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"width_s": 3600},
    ).select_columns(["bucket_ts"])
    return grouped_count(bucketed, ["bucket_ts"]).sort("bucket_ts")


def events_top_types(sf_dir: str) -> Dataset:
    """Count per event_type (frequency operator A1 shape, exact)."""
    return grouped_count(_events(sf_dir, ["event_type"]), ["event_type"]
                         ).sort("event_type")  # deterministic driver-hash order


PROPS_K_PATTERN = r'"k": *(?P<k>-?[0-9]+)'


def _props_k_partial(batch: pa.Table) -> pa.Table:
    k = pc.cast(
        pc.struct_field(
            pc.extract_regex(batch["props"], PROPS_K_PATTERN), "k"
        ),
        pa.int64(),
    )
    t = pa.table({"event_type": batch["event_type"], "k": k})
    agg = t.group_by(["event_type"]).aggregate([("k", "sum"), ([], "count_all")])
    return agg.rename_columns(["event_type", "sum_k", "cnt"])


def events_props_k_sum(sf_dir: str) -> Dataset:
    """Semi-structured props extraction: the integer ``k`` field of the JSON
    props string, summed per event_type (vectorized regex extract — exact
    int aggregation, so oracle-comparable unlike float sums)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_type", "props"])
    partials = ds.map_batches(
        _props_k_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("event_type").aggregate(
        Sum("sum_k", alias_name="sum_k"), Sum("cnt", alias_name="cnt")
    ).sort("event_type")  # deterministic driver-hash order


def events_value_range(sf_dir: str) -> Dataset:
    """min/max/count of value per event_type — order-independent aggregates
    (float SUM is deliberately avoided in oracle-checked queries: its result
    depends on reduction order)."""
    ds = _events(sf_dir, ["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
        Count(alias_name="cnt"),
    ).sort("event_type")  # deterministic driver-hash order

# --- conversion funnel ---------------------------------------------------------

FUNNEL_FROM = "signup"
FUNNEL_TO = "purchase"
FUNNEL_WINDOW_S = 7 * 86400   # conversion window after FIRST signup


def _funnel_types_only(batch: pa.Table) -> pa.Table:
    return batch.filter(
        pc.is_in(batch["event_type"],
                 value_set=pa.array([FUNNEL_FROM, FUNNEL_TO]))
    )


def _funnel_block(batch: pa.Table) -> pa.Table:
    """Per-user funnel evaluation for one user-exclusive partition, fully
    vectorized: first-signup per user (groupby min), then an inner join of
    purchases against it and a window test. Emits two scalar partials."""
    import pandas as pd

    if batch.num_rows == 0:
        return pa.table({"signup_users": pa.array([0], type=pa.int64()),
                         "converted_users": pa.array([0], type=pa.int64())})
    df = batch.to_pandas()
    first = (
        df[df["event_type"] == FUNNEL_FROM]
        .groupby("user_id")["ts"].min().rename("fs")
    )
    p = df[df["event_type"] == FUNNEL_TO][["user_id", "ts"]]
    p = p.join(first, on="user_id", how="inner")
    ok = p[(p["ts"] >= p["fs"])
           & (p["ts"] <= p["fs"] + pd.Timedelta(seconds=FUNNEL_WINDOW_S))]
    return pa.table({
        "signup_users": pa.array([len(first)], type=pa.int64()),
        "converted_users": pa.array([ok["user_id"].nunique()],
                                    type=pa.int64()),
    })


def events_funnel(sf_dir: str):
    """Signup → purchase conversion funnel: how many users ever signed up,
    and how many of them purchased within FUNNEL_WINDOW_S of their FIRST
    signup.

    Shape: pre-filter to the two funnel steps (the only rows that move),
    ONE keyed hash repartition on user_id (user-exclusive blocks), a
    vectorized per-block funnel evaluation, then a tiny global sum of the
    two per-block scalars — versus the naive groupby-then-join, this is a
    single shuffle of the filtered minority. Partitioning assumption: one
    user's funnel events fit one worker."""
    import pandas as pd

    from .common import global_sums
    from .dataprep import _keyed_blocks

    ev = _events(sf_dir, ["user_id", "event_type", "ts"]).map_batches(
        _funnel_types_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    partials = _keyed_blocks(ev, ["user_id"], _funnel_block)
    sums = global_sums(partials, ["signup_users", "converted_users"])
    return pd.DataFrame([sums])[["signup_users", "converted_users"]]


# --- per-group exact value quantiles --------------------------------------------

EVQ_PCTS = (0, 25, 50, 75, 100)


def _evq_block_counts(t: pa.Table) -> dict:
    """Phase 1: per-event_type row count of one sorted block (tiny dict to
    the driver)."""
    if t.num_rows == 0:
        return {}
    agg = t.group_by(["event_type"]).aggregate([([], "count_all")])
    cnt_col = [c for c in agg.column_names if c != "event_type"][0]
    return dict(zip(agg["event_type"].to_pylist(),
                    agg[cnt_col].to_pylist()))


def _evq_pick(t: pa.Table, offsets: dict, targets: dict) -> pa.Table:
    """Phase 2: emit rows of one sorted block whose within-group GLOBAL
    rank (block offset + local rank) is a requested quantile index."""
    import numpy as np

    empty = pa.table(
        {"event_type": pa.array([], type=pa.string()),
         "pct": pa.array([], type=pa.int64()),
         "value": pa.array([], type=pa.float64())}
    )
    if t.num_rows == 0:
        return empty
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    vals = t["value"].to_numpy(zero_copy_only=False)
    starts = np.r_[0, np.flatnonzero(et[1:] != et[:-1]) + 1]
    out_e, out_p, out_v = [], [], []
    for s in starts:
        g = et[s]
        e = s + 1
        while e < len(et) and et[e] == g:
            e += 1
        base = offsets.get(g, 0)
        for pct, rank in targets.get(g, ()):
            local = rank - base
            if 0 <= local < e - s:
                out_e.append(g)
                out_p.append(pct)
                out_v.append(float(vals[s + local]))
    return pa.table(
        {"event_type": pa.array(out_e, type=pa.string()),
         "pct": pa.array(out_p, type=pa.int64()),
         "value": pa.array(out_v, type=pa.float64())}
    )


def events_value_quantiles(sf_dir: str, pcts: tuple[int, ...] = EVQ_PCTS):
    """EXACT per-event_type quantiles of the continuous ``value`` column
    (index = pct·(n−1)//100 of each group's sorted values). Unlike the
    count-fold length quantiles (low-cardinality values), ``value`` is
    continuous — a (value, count) histogram would move every distinct
    value. Instead: ONE distributed sort by (event_type, value), then the
    two-phase block-offset machinery generalized per group — phase 1
    returns a tiny {group: count} dict per block, the driver cumsums
    per-group block offsets and computes each group's target ranks, phase
    2 emits only the selected rows. Driver state is blocks × groups ints;
    no value column ever leaves the object store except the ≤|groups|·|pcts|
    winners. Tie runs make any rank choice value-identical, so the float
    is bit-equal to the oracle's row_number selection."""
    import numpy as np
    import ray
    import ray.data

    ordered = _events(sf_dir, ["event_type", "value"]) \
        .sort(["event_type", "value"]).materialize()
    refs = ordered.to_arrow_refs()
    part = ray.remote(num_cpus=0.25)(_evq_block_counts)
    per_block = ray.get([part.remote(r) for r in refs])
    groups = sorted({g for d in per_block for g in d})
    totals = {g: sum(d.get(g, 0) for d in per_block) for g in groups}
    targets = {
        g: tuple((pct, pct * (totals[g] - 1) // 100) for pct in pcts)
        for g in groups if totals[g] > 0
    }
    offsets = []
    run = dict.fromkeys(groups, 0)
    for d in per_block:
        offsets.append(dict(run))
        for g, c in d.items():
            run[g] += c
    app = ray.remote(num_cpus=0.25)(_evq_pick)
    picked = ray.data.from_arrow_refs(
        [app.remote(r, o, targets) for r, o in zip(refs, offsets)]
    )
    return (
        picked.to_pandas()
        .sort_values(["event_type", "pct"]).reset_index(drop=True)
    )


HISTQ_PCTS = (50, 90, 99)
HISTQ_BIN_WIDTH = 1.0  # unit-width bins: floor(value) is exact in both engines


def _hist_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (event_type, bin, cnt) partials — the mergeable state of a
    fixed-bin histogram sketch (bin = floor(value); integer counts merge by
    addition in any order)."""
    import numpy as np

    v = batch["value"].to_numpy(zero_copy_only=False)
    b = np.floor(v).astype(np.int64)
    t = pa.table({"event_type": batch["event_type"],
                  "bin": pa.array(b, type=pa.int64())})
    agg = t.group_by(["event_type", "bin"]).aggregate([([], "count_all")])
    return agg.rename_columns(["event_type", "bin", "cnt"])


def events_value_hist_quantiles(sf_dir: str,
                                pcts: tuple[int, ...] = HISTQ_PCTS):
    """APPROXIMATE quantiles from a mergeable fixed-bin HISTOGRAM SKETCH —
    the scale companion to events_value_quantiles' exact selection: per-
    batch (event_type, bin) count partials merge through one tiny groupby
    (commutative int sums, no sort, no second pass over the data), and the
    estimate is the bin containing the nearest-rank index (error ≤ bin
    width, here 1.0). The only driver materialization is the histogram
    itself — bounded by event_types × value_range/width rows, independent
    of the event count, which is exactly what makes the sketch the
    10^12-row path. Deterministic, so the same selection rule replayed in
    SQL is bit-equal."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    hist = _events(sf_dir, ["event_type", "value"]).map_batches(
        _hist_partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["event_type", "bin"]).aggregate(
        Sum("cnt", alias_name="cnt")
    ).to_pandas()
    out = []
    for etype, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("bin")
        cum = g["cnt"].cumsum().to_numpy()
        bins = g["bin"].to_numpy()
        n = int(cum[-1])
        for pct in pcts:
            k = pct * (n - 1) // 100
            out.append((etype, pct, int(bins[np.searchsorted(cum, k + 1)])))
    return pd.DataFrame(out, columns=["event_type", "pct", "est_bin"])


# --- weekly retention cohorts ---------------------------------------------------

RETENTION_WEEK_S = 7 * 86400


def _week_col(batch: pa.Table) -> pa.Table:
    """(user_id, week) with week = epoch-floored week index (integer
    microsecond division; timestamps are post-1970 so trunc == floor,
    matching the oracle's //)."""
    import numpy as np

    us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    week = us // (RETENTION_WEEK_S * 1_000_000)
    return pa.table(
        {
            "user_id": batch["user_id"],
            "week": pa.array(week.astype(np.int64), type=pa.int64()),
        }
    )


def _retention_block(batch: pa.Table) -> pa.Table:
    """(cohort_week, week_offset, n_users) partials for one user-exclusive
    partition, fully vectorized: sort by (user, week); each user's first
    row is its cohort week (min); consecutive-dedupe gives the user's
    DISTINCT offsets; a grouped run-length count folds users. Because a
    user lives in exactly one partition, each contributes at most 1 per
    (cohort, offset) — summing partials IS the exact distinct-user count,
    with no global distinct shuffle."""
    import numpy as np

    empty = pa.table(
        {"cohort_week": pa.array([], type=pa.int64()),
         "week_offset": pa.array([], type=pa.int64()),
         "n_users": pa.array([], type=pa.int64())}
    )
    if batch.num_rows == 0:
        return empty
    u = batch["user_id"].to_numpy(zero_copy_only=False)
    w = batch["week"].to_numpy(zero_copy_only=False)
    order = np.lexsort((w, u))
    u, w = u[order], w[order]
    first = np.r_[True, u[1:] != u[:-1]]
    cohort = w[first][np.cumsum(first) - 1]   # per-row cohort = user's min week
    off = w - cohort
    keep = np.r_[True, (u[1:] != u[:-1]) | (off[1:] != off[:-1])]
    ck, ok = cohort[keep], off[keep]
    ko = np.lexsort((ok, ck))
    ck, ok = ck[ko], ok[ko]
    starts = np.flatnonzero(np.r_[True, (ck[1:] != ck[:-1]) | (ok[1:] != ok[:-1])])
    counts = np.diff(np.r_[starts, len(ck)])
    return pa.table(
        {
            "cohort_week": pa.array(ck[starts], type=pa.int64()),
            "week_offset": pa.array(ok[starts], type=pa.int64()),
            "n_users": pa.array(counts.astype(np.int64), type=pa.int64()),
        }
    )


def events_retention(sf_dir: str):
    """Weekly retention cohort matrix: users are cohorted by their
    first-activity week; n_users counts how many of each cohort were
    active k weeks later — the classic product-analytics retention table.

    Shape: one map to (user_id, week) — 16 B rows, the text/props never
    move — one keyed hash repartition on user_id, then a vectorized
    per-block pass emitting at most one (cohort, offset) row per user.
    Because a user lives in exactly one partition, summing the partials
    IS the exact distinct-user count: one shuffle total. The final fold
    runs on the driver over ≤ partitions × weeks²/2 rows — bounded by the
    CALENDAR (a 10-year corpus is ~135k pairs), independent of corpus
    rows, the same bounded-register argument as the HLL estimate.
    Partitioning assumption: one user's rows fit one worker (as
    sessions/funnel)."""
    from .dataprep import _keyed_blocks

    wk = _events(sf_dir, ["user_id", "ts"]).map_batches(
        _week_col, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    partials = _keyed_blocks(wk, ["user_id"], _retention_block)
    return (
        partials.to_pandas()
        .groupby(["cohort_week", "week_offset"], as_index=False)["n_users"]
        .sum()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )


# --- integer-exact anomaly detection ------------------------------------------

ANOM_WIDTH_S = 3600   # hourly buckets
ANOM_Z = 3            # |cnt - μ| > Z·σ flags the bucket


def _anomaly_block(batch: pa.Table) -> pa.Table:
    """Flag anomalous buckets with ALL-INTEGER arithmetic (python ints, no
    overflow): (n·cnt − S)² > Z²·(n·Q − S²) ⟺ (cnt − μ)² > Z²σ² where
    S = Σcnt, Q = Σcnt², μ = S/n, σ² = (nQ − S²)/n². No float mean/variance
    whose summation order could diverge from the oracle's."""
    cnt = [int(c) for c in batch["cnt"].to_pylist()]
    n, S, Q = len(cnt), sum(cnt), sum(c * c for c in cnt)
    rhs = ANOM_Z * ANOM_Z * (n * Q - S * S)
    mask = [((n * c - S) ** 2 > rhs) for c in cnt]
    return batch.filter(pa.array(mask, type=pa.bool_()))


def events_anomaly(sf_dir: str) -> Dataset:
    """Buckets whose event count deviates from the global mean by more than
    ANOM_Z standard deviations — the alerting pass of a telemetry pipeline.

    Shape: the heavy part is the distributed pre-aggregated bucket count;
    the z-test then runs over the POST-AGGREGATE series (one row per hour —
    tiny at any scale, like events_sliding_avg) in a single block. The test
    itself is integer-exact so the oracle replays it bit-for-bit in
    HUGEINT."""
    ds = _events(sf_dir, ["ts"])
    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"width_s": ANOM_WIDTH_S},
    ).select_columns(["bucket_ts"])
    counts = grouped_count(bucketed, ["bucket_ts"]).sort("bucket_ts")
    return counts.repartition(1).map_batches(
        _anomaly_block, batch_format="pyarrow", batch_size=None
    )


# --- per-group OLS linear fit from integer sufficient statistics ----------------

LINFIT_EPOCH0 = 1_704_067_200     # 2024-01-01 UTC (seconds) — fixture epoch
LINFIT_X_BUCKET_S = 60            # x = minutes since LINFIT_EPOCH0
LINFIT_Y_SCALE = 100              # y = floor(value · 100), centi-units


def _linfit_partials(batch: pa.Table, with_y2: bool = False) -> pa.Table:
    """Per-block INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx²) per
    event_type — the mergeable state of a distributed least-squares fit
    (the same partial/combine shape as grouped_count; nothing but five
    int64 sums per group ever shuffles). x is quantized to minutes since a
    fixed epoch and y to centi-units so every sum is integer-exact and
    order-independent; the quantization constants set the int64 headroom
    (~4e9 rows per group at these magnitudes — widen LINFIT_X_BUCKET_S for
    bigger corpora)."""
    import numpy as np

    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    ts_s = ts // 1_000_000
    # HAZARD (ADVICE r4): numpy // floors toward -inf but the oracle's
    # DuckDB // truncates toward zero, so a NEGATIVE (ts_s - EPOCH0) would
    # silently break parity (-7//2 = -4 numpy vs -3 DuckDB). Guard rather
    # than shift: x must be non-negative by construction.
    if ts_s.size and int(ts_s.min()) < LINFIT_EPOCH0:
        raise ValueError(
            f"_linfit_partials: event ts {int(ts_s.min())} predates "
            f"LINFIT_EPOCH0={LINFIT_EPOCH0}; floor-vs-trunc division would "
            "diverge from the SQL oracle — lower LINFIT_EPOCH0."
        )
    x = (ts_s - LINFIT_EPOCH0) // LINFIT_X_BUCKET_S
    y = np.floor(
        batch["value"].to_numpy(zero_copy_only=False) * LINFIT_Y_SCALE
    ).astype(np.int64)
    et = np.asarray(batch["event_type"].to_pandas(), dtype=object)
    types, code = np.unique(et, return_inverse=True)
    k = len(types)
    out = {}
    cols = [("n", None), ("sum_x", x), ("sum_y", y),
            ("sum_xy", x * y), ("sum_x2", x * x)]
    if with_y2:
        cols.append(("sum_y2", y * y))
    for name, w in cols:
        acc = np.zeros(k, dtype=np.int64)
        if w is None:
            np.add.at(acc, code, 1)
        else:
            np.add.at(acc, code, w)
        out[name] = acc
    return pa.table(
        {"event_type": pa.array(types, type=pa.string()),
         **{n: pa.array(v, type=pa.int64()) for n, v in out.items()}}
    )


def events_value_linfit(sf_dir: str):
    """Per-event_type ordinary-least-squares fit of value against time —
    the distributed-regression pattern: every block contributes five
    integer sufficient statistics per group, one bounded groupby-sum
    merges them, and slope/intercept derive from the merged integers on
    the driver (exact Python-int numerator/denominator, then ONE float
    division each — bit-stable against the oracle's HUGEINT replay)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    partials = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        _linfit_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby("event_type").aggregate(
        *[Sum(c, alias_name=c)
          for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_x2")]
    ).to_pandas()
    slopes, intercepts = [], []
    for r in agg.itertuples(index=False):
        n, sx, sy, sxy, sx2 = (int(r.n), int(r.sum_x), int(r.sum_y),
                               int(r.sum_xy), int(r.sum_x2))
        num, den = n * sxy - sx * sy, n * sx2 - sx * sx
        if den == 0:
            slopes.append(None)
            intercepts.append(None)
            continue
        slope = float(num) / float(den)
        slopes.append(slope)
        intercepts.append((float(sy) - slope * float(sx)) / float(n))
    agg["slope"] = pd.array(slopes, dtype="float64")
    agg["intercept"] = pd.array(intercepts, dtype="float64")
    return agg.sort_values("event_type").reset_index(drop=True)


# --- streaming watermark: tumbling windows with late-arrival classification ----

LATE_WINDOW_S = 3600         # tumbling event-time window width
LATE_ALLOWED_S = 1800        # allowed lateness behind the high-watermark
LATE_STRAGGLER_DELAY_S = 3 * 3600   # stragglers arrive 3 h of event time late
LATE_STRAGGLER_MOD = 17             # ~1/17 of events are stragglers
_TS_SENTINEL = -(1 << 62)    # "no prior event" watermark


def _arrival_key(batch: pa.Table) -> pa.Table:
    """Deterministic ARRIVAL-TIME model: the fixture's event_id order is
    perfectly time-ordered (no event would ever be late), so ingest skew
    is simulated by delaying a hash-selected ~1/LATE_STRAGGLER_MOD subset
    by LATE_STRAGGLER_DELAY_S of event time — late by a fixed DURATION,
    so the late fraction is scale-invariant (position-based delays would
    shrink with event density). Affine-hash selection has an exact SQL
    twin."""
    import numpy as np

    from .. import hashing as H

    ids = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    strag = ((ids % H.P) * H.SHUF_A + H.SHUF_B) % H.P % LATE_STRAGGLER_MOD == 0
    key = ts + strag * (LATE_STRAGGLER_DELAY_S * 1_000_000)
    return batch.append_column(
        "arrival_key", pa.array(key.astype(np.int64), type=pa.int64())
    )


def _block_ts_max(t: pa.Table) -> int:
    if not t.num_rows:
        return _TS_SENTINEL
    return int(pc.max(pc.cast(t["ts"], pa.int64())).as_py())


def _late_partial_counts(t: pa.Table, wm0: int) -> pa.Table:
    """Per-block on-time/late partial counts given the exclusive running
    max event-time of all PRIOR blocks (arrival order): the in-block
    prefix max composes with wm0, so the per-row watermark is exact.
    Flink-style rule: an event is LATE iff its window already closed
    under the watermark at its arrival, i.e. window_end ≤ prev_max −
    allowed_lateness."""
    import numpy as np

    w_us = LATE_WINDOW_S * 1_000_000
    a_us = LATE_ALLOWED_S * 1_000_000
    empty = pa.table({"bucket_ts": pa.array([], type=pa.timestamp("us")),
                      "on_time": pa.array([], type=pa.int64()),
                      "late": pa.array([], type=pa.int64())})
    if not t.num_rows:
        return empty
    ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    prev_max = np.concatenate(
        [[wm0], np.maximum(np.maximum.accumulate(ts)[:-1], wm0)]
    )
    bucket = (ts // w_us) * w_us
    late = (prev_max > _TS_SENTINEL) & (bucket + w_us <= prev_max - a_us)
    ub, code = np.unique(bucket, return_inverse=True)
    late_c = np.zeros(len(ub), dtype=np.int64)
    np.add.at(late_c, code, late)
    tot = np.bincount(code, minlength=len(ub)).astype(np.int64)
    return pa.table({
        "bucket_ts": pa.array(ub, type=pa.timestamp("us")),
        "on_time": pa.array(tot - late_c, type=pa.int64()),
        "late": pa.array(late_c, type=pa.int64()),
    })


def events_late_arrivals(sf_dir: str) -> Dataset:
    """Tumbling-window counts with WATERMARK-based late-arrival
    classification — the streaming-window semantics Ray Data's batch API
    lacks, composed from batch primitives: arrival order is the
    deterministic straggler-delayed ingest model (:func:`_arrival_key`),
    the high-watermark is a distributed PREFIX MAX over that order (same
    two-phase shape as the pack/shuffle prefix sums — one int per block
    to the driver, max-combined instead of summed), and each block
    classifies its rows exactly with (block-prefix ∘ in-block running
    max). Output per window: on-time vs late counts (late ⇔ window_end ≤
    watermark − allowed_lateness at arrival). Blocks never leave the
    object store; the only driver state is one int64 per block."""
    import numpy as np
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    ordered = _events(sf_dir, ["event_id", "ts"]).map_batches(
        _arrival_key, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["arrival_key", "event_id"])
    refs = ordered.to_arrow_refs()
    part = ray.remote(num_cpus=0.5)(_block_ts_max)
    maxes = ray.get([part.remote(r) for r in refs])
    prefix = np.concatenate(
        [[_TS_SENTINEL], np.maximum.accumulate(np.asarray(maxes))]
    )[:-1]
    app = ray.remote(num_cpus=0.5)(_late_partial_counts)
    partials = ray.data.from_arrow_refs(
        [app.remote(r, int(p)) for r, p in zip(refs, prefix)]
    )
    return partials.groupby("bucket_ts").aggregate(
        Sum("on_time", alias_name="on_time"), Sum("late", alias_name="late")
    ).sort("bucket_ts")


def events_value_corr(sf_dir: str):
    """Per-event_type PEARSON CORRELATION of value against time — the same
    mergeable integer-sufficient-statistics shape as
    :func:`events_value_linfit` with a sixth sum (Σy²): one bounded
    groupby-sum merges six int64 partials per group; r derives on the
    driver from exact Python-int numerator/variances (sqrt is IEEE
    correctly-rounded on both engines, so the one float expression is
    bit-stable vs the oracle)."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    partials = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        _linfit_partials, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"with_y2": True},
    )
    agg = partials.groupby("event_type").aggregate(
        *[Sum(c, alias_name=c)
          for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2")]
    ).to_pandas()
    corrs = []
    for r in agg.itertuples(index=False):
        n, sx, sy, sxy, sx2, sy2 = (int(r.n), int(r.sum_x), int(r.sum_y),
                                    int(r.sum_xy), int(r.sum_x2),
                                    int(r.sum_y2))
        num = n * sxy - sx * sy
        dx, dy = n * sx2 - sx * sx, n * sy2 - sy * sy
        if dx == 0 or dy == 0:
            corrs.append(None)
            continue
        corrs.append(float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy))))
    agg["corr"] = pd.array(corrs, dtype="float64")
    return agg.sort_values("event_type").reset_index(drop=True)


# --- equi-depth binning (histogram equalization) --------------------------------

EQ_BINS = 8


def _bin_partials(t: pa.Table, offsets: dict, totals: dict,
                  q: int) -> pa.Table:
    """Per-block equi-depth bin partials for a (event_type, value)-sorted
    block: global per-group rank = group block-offset + local position,
    bin = the exact ntile(q) rank rule (first n%q bins take one extra
    row), then per-(group, bin) count/min/max partials. Tie runs
    straddling a bin edge are harmless: the sorted multiset is split at
    fixed ranks, so per-bin (count, min, max) is permutation-invariant —
    exactly why the ntile oracle is deterministic too."""
    import numpy as np

    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "bin": pa.array([], type=pa.int64()),
                      "n_rows": pa.array([], type=pa.int64()),
                      "vmin": pa.array([], type=pa.float64()),
                      "vmax": pa.array([], type=pa.float64())})
    if t.num_rows == 0:
        return empty
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    vals = t["value"].to_numpy(zero_copy_only=False)
    starts = np.r_[0, np.flatnonzero(et[1:] != et[:-1]) + 1]
    ends = np.r_[starts[1:], len(et)]
    o_g, o_b, o_n, o_lo, o_hi = [], [], [], [], []
    for s, e in zip(starts, ends):
        g = et[s]
        n, base = totals[g], offsets.get(g, 0)
        rank = base + np.arange(e - s, dtype=np.int64)
        bsz, r = n // q, n % q
        edge = r * (bsz + 1)
        bin_ = np.where(
            rank < edge, rank // (bsz + 1),
            r + (rank - edge) // max(bsz, 1),
        ) + 1
        v = vals[s:e]
        ub, code = np.unique(bin_, return_inverse=True)
        cnt = np.bincount(code).astype(np.int64)
        lo = np.full(len(ub), np.inf)
        np.minimum.at(lo, code, v)
        hi = np.full(len(ub), -np.inf)
        np.maximum.at(hi, code, v)
        o_g.extend([g] * len(ub))
        o_b.append(ub)
        o_n.append(cnt)
        o_lo.append(lo)
        o_hi.append(hi)
    return pa.table({
        "event_type": pa.array(o_g, type=pa.string()),
        "bin": pa.array(np.concatenate(o_b), type=pa.int64()),
        "n_rows": pa.array(np.concatenate(o_n), type=pa.int64()),
        "vmin": pa.array(np.concatenate(o_lo), type=pa.float64()),
        "vmax": pa.array(np.concatenate(o_hi), type=pa.float64()),
    })


def events_value_bins(sf_dir: str, q: int = EQ_BINS) -> Dataset:
    """EQUI-DEPTH binning (histogram equalization) per event_type: split
    each group's sorted values into q rank-balanced bins and report each
    bin's row count and [min, max] value span — the data-dependent bin
    boundaries a feature-bucketizer or a skew report needs.

    Shape: the per-group two-phase rank machinery of
    :func:`events_value_quantiles` generalized from picking single ranks
    to assigning EVERY row its global per-group rank (one {group: count}
    dict per block to the driver, never a value), the exact ntile rule per
    block, per-block (group, bin) partials, and one bounded groupby
    merge — ≤ groups × q rows end to end."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ordered = _events(sf_dir, ["event_type", "value"]) \
        .sort(["event_type", "value"]).materialize()
    refs = ordered.to_arrow_refs()
    part = ray.remote(num_cpus=0.25)(_evq_block_counts)
    per_block = ray.get([part.remote(r) for r in refs])
    groups = sorted({g for d in per_block for g in d})
    totals = {g: sum(d.get(g, 0) for d in per_block) for g in groups}
    offsets = []
    run = dict.fromkeys(groups, 0)
    for d in per_block:
        offsets.append(dict(run))
        for g, c in d.items():
            run[g] += c
    app = ray.remote(num_cpus=0.25)(_bin_partials)
    partials = ray.data.from_arrow_refs(
        [app.remote(r, o, totals, q) for r, o in zip(refs, offsets)]
    )
    return partials.groupby(["event_type", "bin"]).aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Min("vmin", alias_name="vmin"),
        Max("vmax", alias_name="vmax"),
    ).sort(["event_type", "bin"])


# --- robust anomaly stats: median / MAD / outlier counts -------------------------

MAD_K = 3   # outlier rule: |value − median| > MAD_K · MAD


def _abs_dev(batch: pa.Table, med_ref) -> pa.Table:
    """(event_type, value) → (event_type, value=|value − group median|):
    the deviation pass between the two distributed selections. The group
    medians are a broadcast dict (≤ |groups| floats)."""
    import numpy as np
    import ray

    med = ray.get(med_ref)
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    v = batch["value"].to_numpy(zero_copy_only=False)
    m = np.array([med[g] for g in et], dtype=np.float64)
    return pa.table({
        "event_type": batch["event_type"],
        "value": pa.array(np.abs(v - m), type=pa.float64()),
    })


def _outlier_partials(batch: pa.Table, ref) -> pa.Table:
    """Per-block (event_type, n, n_outliers) partials under the broadcast
    (median, MAD) pair — the final counting scan."""
    import numpy as np
    import ray

    med, mad = ray.get(ref)
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    v = batch["value"].to_numpy(zero_copy_only=False)
    groups, code = np.unique(et, return_inverse=True)
    m = np.array([med[g] for g in groups], dtype=np.float64)[code]
    d = np.array([mad[g] for g in groups], dtype=np.float64)[code]
    out = np.abs(v - m) > MAD_K * d
    n = np.bincount(code, minlength=len(groups)).astype(np.int64)
    n_out = np.zeros(len(groups), dtype=np.int64)
    np.add.at(n_out, code, out)
    return pa.table({
        "event_type": pa.array(groups, type=pa.string()),
        "n": pa.array(n, type=pa.int64()),
        "n_outliers": pa.array(n_out, type=pa.int64()),
    })


def events_value_mad(sf_dir: str):
    """ROBUST anomaly statistics per event_type: exact median, exact MAD
    (median absolute deviation), and the count of |value − median| >
    MAD_K·MAD outliers — the outlier rule that, unlike the z-score
    (events_anomaly), is itself immune to the outliers it hunts.

    Shape: TWO chained distributed selections (the per-group two-phase
    rank machinery of events_value_quantiles, run once on value and once
    on the deviations — the deviation pass broadcasts ≤ |groups| medians,
    never a value), then one counting scan under the broadcast
    (median, MAD) pair. Three scans + two sorts is the honest cost of
    exact robust statistics; every float op (subtract, abs, compare) is
    the same IEEE expression the oracle evaluates."""
    import pandas as pd
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    med_df = events_value_quantiles(sf_dir, pcts=(50,))
    med = dict(zip(med_df["event_type"], med_df["value"]))
    med_ref = ray.put(med)

    devs = _events(sf_dir, ["event_type", "value"]).map_batches(
        _abs_dev, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"med_ref": med_ref},
    ).sort(["event_type", "value"]).materialize()
    refs = devs.to_arrow_refs()
    part = ray.remote(num_cpus=0.25)(_evq_block_counts)
    per_block = ray.get([part.remote(r) for r in refs])
    groups = sorted({g for d in per_block for g in d})
    totals = {g: sum(d.get(g, 0) for d in per_block) for g in groups}
    targets = {g: ((50, 50 * (totals[g] - 1) // 100),)
               for g in groups if totals[g] > 0}
    offsets = []
    run = dict.fromkeys(groups, 0)
    for d in per_block:
        offsets.append(dict(run))
        for g, c in d.items():
            run[g] += c
    app = ray.remote(num_cpus=0.25)(_evq_pick)
    picked = ray.data.from_arrow_refs(
        [app.remote(r, o, targets) for r, o in zip(refs, offsets)]
    ).to_pandas()
    mad = dict(zip(picked["event_type"], picked["value"]))

    ref2 = ray.put((med, mad))
    counts = _events(sf_dir, ["event_type", "value"]).map_batches(
        _outlier_partials, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"ref": ref2},
    ).groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Sum("n_outliers", alias_name="n_outliers")
    ).to_pandas()
    counts["median"] = counts["event_type"].map(med)
    counts["mad"] = counts["event_type"].map(mad)
    return counts.sort_values("event_type").reset_index(drop=True)[
        ["event_type", "n", "median", "mad", "n_outliers"]
    ]


# --- windowed heavy hitters: top-k event types per day ----------------------------

DAILY_TOP_K = 3


def events_daily_top_types(sf_dir: str, k: int = DAILY_TOP_K):
    """Top-k event types per DAY window — the windowed-heavy-hitter report.
    Shape: the distributed work is the pre-aggregated grouped count per
    (day, event_type) — bounded at days × |types| rows no matter how many
    events feed it — and the per-window rank runs on that bounded table
    (ties by count desc, then event_type, exactly the oracle's
    row_number order)."""
    ds = _events(sf_dir, ["ts", "event_type"])
    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"width_s": 86400},
    ).select_columns(["bucket_ts", "event_type"])
    counts = grouped_count(
        bucketed, ["bucket_ts", "event_type"]
    ).to_pandas()
    counts = counts.sort_values(
        ["bucket_ts", "cnt", "event_type"], ascending=[True, False, True]
    )
    counts["rank"] = counts.groupby("bucket_ts").cumcount() + 1
    out = counts[counts["rank"] <= k].reset_index(drop=True)
    out["rank"] = out["rank"].astype("int64")
    return out[["bucket_ts", "rank", "event_type", "cnt"]]


# --- CUSUM drift detection (exact-int changepoint scan per event type) -----------

CUSUM_SCALE = 10**6   # qv = floor(value · CUSUM_SCALE): one shared quantization


def _cusum_qv(batch: pa.Table) -> pa.Table:
    """Quantize value to the integer domain BEFORE the sort, so every
    arithmetic op downstream (prefix sums, the n·pre − k·tot deviation) is
    exact and bit-replayable in SQL — same floor(value·SCALE) IEEE
    expression the oracle evaluates."""
    qv = pc.cast(
        pc.floor(pc.multiply(batch["value"], pa.scalar(float(CUSUM_SCALE)))),
        pa.int64(),
    )
    return pa.table({
        "event_type": batch["event_type"], "ts": batch["ts"],
        "event_id": batch["event_id"], "qv": qv,
    })


def _cusum_runs(et, qv):
    """(start, end) pairs of the contiguous per-type runs of a
    (event_type, ts, event_id)-sorted block."""
    import numpy as np

    change = np.nonzero(et[1:] != et[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [et.size]))
    return zip(starts.tolist(), ends.tolist())


def _cusum_block_partials(t: pa.Table) -> dict:
    """Per-type (row count, Σqv) for one sorted block — the only state the
    driver accumulates: |types| × |blocks| integer pairs."""
    out: dict = {}
    et = t["event_type"].to_numpy(zero_copy_only=False)
    if et.size == 0:
        return out
    qv = t["qv"].to_numpy(zero_copy_only=False)
    for s, e in _cusum_runs(et, qv):
        out[et[s]] = (e - s, int(qv[s:e].sum()))
    return out


def _cusum_block_scan(t: pa.Table, offsets: dict, n_tot: dict,
                      q_tot: dict) -> dict:
    """Per-type best (deviation, position) candidate within one sorted
    block: c_k = n·pre_k − k·tot (the mean-centered CUSUM scaled by n so
    it stays integral), argmax |c_k| with ties to the SMALLEST k. int64
    vectorized fast path under a proven bound, exact Python-int loop
    above it (n·pre outgrows 2^63 at extreme corpus scale)."""
    import numpy as np

    out: dict = {}
    et = t["event_type"].to_numpy(zero_copy_only=False)
    if et.size == 0:
        return out
    qv = t["qv"].to_numpy(zero_copy_only=False)
    for s, e in _cusum_runs(et, qv):
        g = et[s]
        n, tot = n_tot[g], q_tot[g]
        k0, p0 = offsets.get(g, (0, 0))
        seg = qv[s:e]
        m = e - s
        # |n·pre − k·tot| ≤ n·(|p0| + Σ|qv|) + n·|tot|; float64 bound with
        # 2^61 slack for the approximation
        approx = float(np.abs(seg).sum(dtype=np.float64)) + abs(p0) + abs(tot)
        if n * approx < float(2**61):
            k = np.int64(k0) + np.arange(1, m + 1, dtype=np.int64)
            pre = np.int64(p0) + np.cumsum(seg, dtype=np.int64)
            a = np.abs(np.int64(n) * pre - k * np.int64(tot))
            i = int(np.argmax(a))          # first max = smallest k
            out[g] = (int(a[i]), int(k[i]))
        else:
            best_a, best_k, pre = -1, -1, p0
            for j, v in enumerate(seg.tolist()):
                pre += v
                a = abs(n * pre - (k0 + j + 1) * tot)
                if a > best_a:
                    best_a, best_k = a, k0 + j + 1
            out[g] = (best_a, best_k)
    return out


def events_cusum_drift(sf_dir: str) -> pd.DataFrame:
    """CUSUM drift/changepoint scan per event_type: over the (ts,
    event_id)-ordered value sequence, the maximum |cumulative deviation
    from the type's own mean| and the 1-indexed position where it peaks —
    the standard "did this metric's level shift, and when" monitor, exact.

    All arithmetic is integer: values quantize once (qv =
    floor(value·CUSUM_SCALE)), and the mean-centered cumulative sum is
    kept integral by scaling with n (c_k = n·pre_k − k·tot, pre_k the
    running Σqv), so driver and oracle agree bit-for-bit — the oracle
    replays the identical expression over HUGEINT window sums.

    Scale shape (the two-phase block prefix-sum pattern of
    docs_pack_sequences / events_value_bins): one distributed sort by
    (event_type, ts, event_id), then per-block (count, Σqv) partials —
    |types|·|blocks| ints are ALL the driver ever holds — then one
    embarrassingly-parallel re-scan per block under broadcast offsets;
    per-block candidates (not rows) come back for the bounded final
    reduce. A running statistic is inherently sequential per type, but
    nothing here materializes a type's sequence in one place."""
    import pandas as pd
    import ray

    ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"]).map_batches(
        _cusum_qv, batch_format="pyarrow", zero_copy_batch=True,
    ).sort(["event_type", "ts", "event_id"]).materialize()
    refs = ds.to_arrow_refs()
    part = ray.remote(num_cpus=0.25)(_cusum_block_partials)
    per_block = ray.get([part.remote(r) for r in refs])
    types = sorted({g for d in per_block for g in d})
    n_tot = {g: 0 for g in types}
    q_tot = {g: 0 for g in types}
    offsets, run = [], {g: (0, 0) for g in types}
    for d in per_block:                       # Python ints: overflow-free
        for g, (c, s) in d.items():
            n_tot[g] += c
            q_tot[g] += s
    for d in per_block:
        offsets.append(dict(run))
        for g, (c, s) in d.items():
            k0, p0 = run[g]
            run[g] = (k0 + c, p0 + s)
    scan = ray.remote(num_cpus=0.25)(_cusum_block_scan)
    cands = ray.get([scan.remote(r, o, n_tot, q_tot)
                     for r, o in zip(refs, offsets)])
    best: dict[str, tuple[int, int]] = {}
    for d in cands:
        for g, (a, k) in d.items():
            cur = best.get(g)
            if cur is None or (a, -k) > (cur[0], -cur[1]):
                best[g] = (a, k)
    return pd.DataFrame({
        "event_type": types,                  # sorted: deterministic order
        "n": pd.array([n_tot[g] for g in types], dtype="int64"),
        "drift": pd.array([best[g][0] for g in types], dtype="int64"),
        "drift_at": pd.array([best[g][1] for g in types], dtype="int64"),
    })
