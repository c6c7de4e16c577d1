"""The pgweasel-parity pipelines, Ray-Data-first.

Each function mirrors one reference subcommand / aggregator (SURVEY.md §2-3)
over the transcript table: ``read_parquet`` (column-pruned) → ONE fused
parse+filter+project ``map_batches`` pass → optional pre-aggregated
``groupby`` / distributed ``sort().limit()``. Reference defaults are kept:
Error floor for ``errors`` (main.rs:85-87), Log floor elsewhere
(main.rs:136,140,145,155,163), 3 s slow threshold (main.rs:157), top-20
messages (main.rs:93), top-10 slow (main.rs:153), 1 h histogram buckets
(main.rs:108), 10 min connection buckets (connections.rs:33).

Divergences from the reference (documented in SURVEY.md §7.4): exact top-N
instead of merge-pruned approximate top-N (error_frequency.rs:54-64); int64
counters instead of u16 (connections.rs:9-17); deterministic tie-breaks on
sorts; rows with unextractable messages are skipped, not fatal.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..kernels import parse_table
from ..sources import lookups
from ..sources.transcripts import read_transcripts
from ..stages.enrich import enrich_batch
from ..stages.parse import add_bucket, parse_filter_project
from .common import global_sums, grouped_count

ERROR_RANK = 8
LOG_RANK = 5
TOP_N_MESSAGES = 20
TOP_SLOW_K = 10
SLOW_THRESHOLD_MS = 3000.0
HIST_WIDTH_S = 3600
CONN_BUCKET_S = 600

# fixed absolute window for the time-range query (parity with oracle SQL)
WINDOW_BEGIN = "2025-05-21 10:30:00"
WINDOW_END = "2025-05-21 11:15:00"
MASK_SUBSTRING = "password authentication failed"


def _us(ts: str) -> int:
    return int(pd.Timestamp(ts).value // 1000)


# --- generic record pipeline (the CLI's `output_results` equivalent) --------

def records(
    sf_dir: str,
    min_rank: int = ERROR_RANK,
    mask: str | None = None,
    begin: str | None = None,
    end: str | None = None,
    feature: str | None = None,  # "is_lock" / "is_system"
    keep: tuple[str, ...] = ("conv_id", "turn_idx", "severity", "text"),
    fmt: str = "auto",  # csv rows (tool=="csv" from raw-log ingest) use
                        # csv severity/message kernels; others plain
) -> Dataset:
    """Filtered record stream with the reference's predicate chain order
    (mask → severity → time → custom; output_results/mod.rs:157-191)."""
    cols = ["conv_id", "turn_idx", "text"]
    if begin or end or "ts" in keep:
        cols.append("ts")
    if fmt == "auto":
        cols.append("tool")
    groups = ["severity"]
    if feature == "is_lock":
        groups.append("locks")
    elif feature == "is_system":
        groups.append("system")
    if "message" in keep:
        groups.append("message")
    if "duration_ms" in keep:
        groups.append("duration")
    ds = read_transcripts(sf_dir, columns=cols)
    return ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=tuple(groups),
            contains=mask,
            min_rank=min_rank,
            begin_us=_us(begin) if begin else None,
            end_us=_us(end) if end else None,
            require=((feature, None),) if feature else (),
            keep=keep,
            fmt=fmt,
        ),
    )


# --- errors ------------------------------------------------------------------

def errors_list(sf_dir: str, min_rank: int = ERROR_RANK) -> Dataset:
    """`pgweasel errors list`: records at/above the Error floor, with their
    parsed severity + message. main.rs:79-91."""
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity", "message"),
            min_rank=min_rank,
            keep=("conv_id", "turn_idx", "severity", "message", "text"),
        ),
    ).sort(["conv_id", "turn_idx"])  # deterministic driver-hash order


def errors_by_severity(sf_dir: str) -> Dataset:
    """Count per severity at/above the Error floor. Reads ONLY the text
    column (prune at the read, not after the parse)."""
    ds = read_transcripts(sf_dir, columns=["text"])
    rows = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity",), min_rank=ERROR_RANK,
                       keep=("severity",)),
    )
    return grouped_count(rows, ["severity"]
                         ).sort("severity")  # deterministic driver-hash order


def errors_top_messages(sf_dir: str, limit: int = TOP_N_MESSAGES) -> Dataset:
    """`pgweasel errors top`: most frequent messages (error_frequency.rs).
    EXACT top-N (the reference's merge-time pruning is approximate); ties
    broken by message ascending for determinism."""
    ds = read_transcripts(sf_dir, columns=["text"])
    msgs = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity", "message"),
            min_rank=ERROR_RANK,
            keep=("message",),
        ),
    )
    msgs = msgs.map_batches(
        _drop_null_messages, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = grouped_count(msgs, ["message"])
    return counts.sort(["cnt", "message"], descending=[True, False]).limit(limit)


def _drop_null_messages(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch["message"]))


def errors_hist(sf_dir: str, width_s: int = HIST_WIDTH_S) -> Dataset:
    """`pgweasel errors hist`: records per epoch-floored bucket
    (error_histogram.rs:21-56), default 1 h."""
    ds = read_transcripts(sf_dir, columns=["text", "ts"])
    filtered = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity",), min_rank=ERROR_RANK, keep=("ts",)),
    )
    bucketed = filtered.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"width_s": width_s},
    ).select_columns(["bucket_ts"])
    return grouped_count(bucketed, ["bucket_ts"]).sort("bucket_ts")


# --- slow --------------------------------------------------------------------

def slow_list(sf_dir: str, threshold_ms: float = SLOW_THRESHOLD_MS) -> Dataset:
    """`pgweasel slow <THRESHOLD>`: duration strictly greater than the
    threshold (filter_slow.rs:18-21; absent duration ⇒ drop), Log floor."""
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    parsed = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity", "duration"),
            min_rank=LOG_RANK,
            keep=("conv_id", "turn_idx", "duration_ms", "text"),
        ),
    )
    return parsed.map_batches(
        _slow_filter, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"threshold_ms": threshold_ms},
    ).sort(["conv_id", "turn_idx"])  # deterministic driver-hash order


def _slow_filter(batch: pa.Table, threshold_ms: float) -> pa.Table:
    mask = pc.fill_null(pc.greater(batch["duration_ms"], threshold_ms), False)
    return batch.filter(mask)


def slow_top(sf_dir: str, k: int = TOP_SLOW_K) -> Dataset:
    """`pgweasel slow top`: top-k by extracted duration (top_slow_query.rs),
    via distributed sort+limit; ties broken by (conv_id, turn_idx)."""
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    parsed = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity", "duration"),
            min_rank=LOG_RANK,
            keep=("conv_id", "turn_idx", "duration_ms", "text"),
        ),
    ).map_batches(_drop_null_durations, batch_format="pyarrow", zero_copy_batch=True)
    return parsed.sort(
        ["duration_ms", "conv_id", "turn_idx"], descending=[True, False, False]
    ).limit(k)


def _drop_null_durations(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch["duration_ms"]))


# --- locks / system / mask / window -----------------------------------------

def locks(sf_dir: str) -> Dataset:
    """`pgweasel locks`: LockingFilter needles at Log floor
    (main.rs:134-137)."""
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity", "locks"),
            min_rank=LOG_RANK,
            require=(("is_lock", None),),
            keep=("conv_id", "turn_idx", "text"),
        ),
    ).sort(["conv_id", "turn_idx"])  # deterministic driver-hash order


def system(sf_dir: str) -> Dataset:
    """`pgweasel system`: SystemFilter needles at Log floor
    (main.rs:138-141)."""
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity", "system"),
            min_rank=LOG_RANK,
            require=(("is_system", None),),
            keep=("conv_id", "turn_idx", "text"),
        ),
    ).sort(["conv_id", "turn_idx"])  # deterministic driver-hash order


def errors_masked(sf_dir: str, mask: str = MASK_SUBSTRING) -> Dataset:
    """`pgweasel errors -m <mask>`: substring mask composes before the
    severity floor (output_results/mod.rs:50-53,157-169); floor Error."""
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity",),
            contains=mask,
            min_rank=ERROR_RANK,
            keep=("conv_id", "turn_idx", "severity", "text"),
        ),
    ).sort(["conv_id", "turn_idx"])  # deterministic driver-hash order


def errors_window(
    sf_dir: str, begin: str = WINDOW_BEGIN, end: str = WINDOW_END
) -> Dataset:
    """`pgweasel errors -b/-e`: inclusive time bounds on the turn timestamp
    (output_results/mod.rs:180-185), floor Error."""
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text", "ts"])
    return ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity",),
            min_rank=ERROR_RANK,
            begin_us=_us(begin),
            end_us=_us(end),
            keep=("conv_id", "turn_idx", "severity", "text"),
        ),
    ).sort(["conv_id", "turn_idx"])  # deterministic driver-hash order


# --- connections -------------------------------------------------------------

def _conn_parse(batch: pa.Table, keep: tuple[str, ...]) -> pa.Table:
    batch = parse_table(batch, groups=("severity", "message", "event", "kv"))
    return batch.select(list(keep))


def connections_summary(sf_dir: str) -> pd.DataFrame:
    """ConnectionsAggregator's four scalar counters (connections.rs:39-104):
    attempts (`connection received:`), authenticated (`connection
    authorized:`), SSL-authenticated, failures (FATAL + auth-failure
    needles). int64 (the reference's u16 overflows at 65k; SURVEY §7.4)."""
    ds = read_transcripts(sf_dir, columns=["text", "tool"])
    partials = ds.map_batches(
        _conn_summary_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    sums = global_sums(
        partials, ["attempts", "authenticated", "authenticated_ssl", "failures"]
    )
    return pd.DataFrame([sums])


def _conn_summary_partial(batch: pa.Table) -> pa.Table:
    batch = parse_table(batch, groups=("severity", "message", "event"),
                        fmt="auto")
    ev = batch["event"]

    def n(mask):
        return pa.array(
            [pc.sum(pc.cast(pc.fill_null(mask, False), pa.int64())).as_py() or 0],
            type=pa.int64(),
        )

    return pa.table(
        {
            "attempts": n(pc.equal(ev, "received")),
            "authenticated": n(pc.equal(ev, "authorized")),
            "authenticated_ssl": n(batch["ssl"]),
            "failures": n(pc.equal(ev, "auth_failure")),
        }
    )


def _conn_grouped(sf_dir: str, event: str, key: str) -> Dataset:
    ds = read_transcripts(sf_dir, columns=["text", "tool"])
    rows = ds.map_batches(
        _conn_key_rows, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"event": event, "key": key},
    )
    return grouped_count(rows, [key]
                         ).sort(key)  # deterministic driver-hash order


def _conn_key_rows(batch: pa.Table, event: str, key: str) -> pa.Table:
    batch = parse_table(batch, groups=("severity", "message", "event", "kv"),
                        fmt="auto")
    mask = pc.fill_null(pc.equal(batch["event"], event), False)
    kept = batch.filter(mask)
    # missing kv → "unknown" (connections.rs:65,85-97)
    return pa.table({key: pc.fill_null(kept[key], "unknown")})


def connections_by_host(sf_dir: str) -> Dataset:
    """Attempts grouped by host= (connections.rs:63-77)."""
    return _conn_grouped(sf_dir, "received", "host")


def connections_by_user(sf_dir: str) -> Dataset:
    return _conn_grouped(sf_dir, "authorized", "user")


def connections_by_db(sf_dir: str) -> Dataset:
    return _conn_grouped(sf_dir, "authorized", "db")


def connections_by_appname(sf_dir: str) -> Dataset:
    return _conn_grouped(sf_dir, "authorized", "appname")


def connections_by_bucket(sf_dir: str, width_s: int = CONN_BUCKET_S) -> Dataset:
    """Attempts per 10-min bucket (connections.rs:71-77,189-227)."""
    ds = read_transcripts(sf_dir, columns=["text", "tool", "ts"])
    rows = ds.map_batches(
        _conn_bucket_rows, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"width_s": width_s},
    )
    return grouped_count(rows, ["bucket_ts"]).sort("bucket_ts")


def _conn_bucket_rows(batch: pa.Table, width_s: int) -> pa.Table:
    batch = parse_table(batch, groups=("severity", "message", "event"),
                        fmt="auto")
    mask = pc.fill_null(pc.equal(batch["event"], "received"), False)
    kept = batch.filter(mask)
    return add_bucket(kept, width_s).select(["bucket_ts"])


def errors_by_sqlstate(sf_dir: str) -> Dataset:
    """Error records grouped by their SQLSTATE-like code (our M-extra
    extractor; codes echo csvlog's SQLSTATE column — north_star)."""
    ds = read_transcripts(sf_dir, columns=["text"])
    rows = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            groups=("severity", "sqlstate"),
            min_rank=ERROR_RANK,
            keep=("sqlstate",),
        ),
    ).map_batches(_drop_null_sqlstates, batch_format="pyarrow",
                  zero_copy_batch=True)
    return grouped_count(rows, ["sqlstate"]
                         ).sort("sqlstate")  # deterministic driver-hash order


def _drop_null_sqlstates(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch["sqlstate"]))


def disconnections_by_host(sf_dir: str) -> Dataset:
    """Disconnection events (our extension of A4's event taxonomy) grouped
    by host=."""
    return _conn_grouped(sf_dir, "disconnection", "host")


# --- sessions (new per north_star) ------------------------------------------

def sessions(sf_dir: str) -> Dataset:
    """Per-conv_id session reconstruction under stable (conv_id, turn_idx)
    order: turn count, time span, error count, and the full transcript
    joined with newlines in turn order.

    Shape: keyed HASH repartition on conv_id co-locates every conversation
    inside one block, then ONE vectorized pandas groupby per block computes
    all aggregates + the ordered transcript concat — no per-group Python
    dispatch from Ray (`map_groups` was ~1 call per conversation; this is
    ~1 call per block).

    Scale note: the shuffle key is conv_id (the skew-sensitive hot key —
    BASELINE.json); per-group work is bounded by conversation length, which
    is physically bounded for transcripts, so no salting is needed here —
    hot-key salting applies to the *aggregate* pipelines (see
    pipelines.common). The keyed HASH exchange is kept for this QUERY even
    though the router moved to write-then-compact: a query has no durable
    sink to compact through, the transcript payload must cross once either
    way, and at query sizes the exchange is a bounded ~1 s of the wall."""
    import ray

    from .common import hash_shuffle

    with hash_shuffle():
        ds = read_transcripts(
            sf_dir, columns=["conv_id", "turn_idx", "text", "ts"]
        )
        parsed = ds.map_batches(
            parse_filter_project,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs=dict(
                groups=("severity",),
                keep=("conv_id", "turn_idx", "text", "ts", "severity_rank"),
            ),
        )
        # cpus//4 aggregator partitions: enough parallelism for the
        # concat-heavy reduce while leaving cores for the map side
        # (1-CPU aggregator actors at n==cpus starve the upstream parse
        # — measured 2.0s at cpus//4 vs 3.5-67s at n==cpus on 32 cores)
        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
        parts = parsed.repartition(n_parts, keys=["conv_id"], sort=False)
        return parts.map_batches(
            _sessions_block, batch_format="pandas", batch_size=None
        ).sort("conv_id")  # deterministic driver-hash order


_SESSION_DTYPES = {
    "conv_id": "object",
    "n_turns": "int64",
    "first_ts": "datetime64[ns]",
    "last_ts": "datetime64[ns]",
    "n_errors": "int64",
    "transcript": "object",
}


def _sessions_block(df: pd.DataFrame) -> pd.DataFrame:
    """All session aggregates for one hash partition in one vectorized
    pandas groupby (blocks are conv_id-exclusive after the keyed
    repartition). Typed empty output keeps downstream block schemas
    consistent."""
    if df.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in _SESSION_DTYPES.items()}
        )
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    df["_err"] = (df["severity_rank"] >= ERROR_RANK).astype("int64")
    g = df.groupby("conv_id", sort=False)
    out = pd.DataFrame(
        {
            "n_turns": g.size().astype("int64"),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
            "n_errors": g["_err"].sum().astype("int64"),
            "transcript": g["text"].agg("\n".join),
        }
    ).reset_index()
    return out[list(_SESSION_DTYPES)]


def conv_first_error(sf_dir: str) -> Dataset:
    """Earliest error turn per conversation (Min aggregate over the
    error-filtered stream)."""
    from ray.data.aggregate import Min

    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    errs = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity",), min_rank=ERROR_RANK,
                       keep=("conv_id", "turn_idx")),
    )
    return errs.groupby("conv_id").aggregate(
        Min("turn_idx", alias_name="first_error_turn")
    ).sort("conv_id")  # deterministic driver-hash order


def sessions_top_errors(sf_dir: str, k: int = 10) -> Dataset:
    """Top-k conversations by error count (ties broken by conv_id).

    Does NOT reconstruct transcripts: only (n_turns, n_errors) per conv are
    needed, so the shuffle moves per-block (conv_id, partial counts) rows —
    the two-phase aggregation pattern — instead of the full text."""
    from ray.data.aggregate import Sum

    ds = read_transcripts(sf_dir, columns=["conv_id", "text"])
    parsed = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity",),
                       keep=("conv_id", "severity_rank")),
    )
    partials = parsed.map_batches(
        _session_count_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = partials.groupby("conv_id").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("n_errors", alias_name="n_errors"),
    )
    return counts.sort(["n_errors", "conv_id"],
                       descending=[True, False]).limit(k)


def _session_count_partial(batch: pa.Table) -> pa.Table:
    err = pc.cast(
        pc.greater_equal(batch["severity_rank"], ERROR_RANK), pa.int64()
    )
    t = pa.table({"conv_id": batch["conv_id"], "n_errors": err})
    agg = t.group_by(["conv_id"]).aggregate(
        [("n_errors", "sum"), ([], "count_all")]
    )
    return agg.rename_columns(["conv_id", "n_errors", "n_turns"])


# --- enrich (new per north_star) --------------------------------------------

def enriched_severity_counts(sf_dir: str) -> Dataset:
    """Broadcast-enrich (role→tenant, tool→subsystem) then count by
    (tenant, subsystem, severity). The lookup dicts are ray.put once and
    land in each actor's __init__ — never shipped per batch."""
    import ray

    role_map = lookups.load_map(sf_dir, "role_tenant")
    tool_map = lookups.load_map(sf_dir, "tool_subsystem")
    ds = read_transcripts(sf_dir, columns=["role", "tool", "text"])
    parsed = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity",), keep=("role", "tool", "severity")),
    )
    enriched = parsed.map_batches(
        enrich_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"role_ref": ray.put(role_map),
                   "tool_ref": ray.put(tool_map)},
    )
    return grouped_count(
        enriched.select_columns(["tenant", "subsystem", "severity"]),
        ["tenant", "subsystem", "severity"],
    ).sort(["tenant", "subsystem", "severity"])  # deterministic order


# --- multi-level aggregate (ROLLUP / grouping sets) ---------------------------

ROLLUP_ALL = "ALL"  # rollup placeholder (no severity/tool value collides)


def severity_tool_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING-SETS/ROLLUP counts over (severity, tool) in ONE distributed
    pass: the only shuffle is the finest-level grouped count (bounded at
    |severities|×|tools| rows — tiny at any corpus size); the (severity)
    subtotals and the grand total are DERIVED from that bounded table on
    the driver, never a second scan. The reference has single-level
    aggregators only (error_frequency.rs, connections.rs); this is the
    multi-level report a fleet-wide triage view needs. 'ALL' is the rollup
    placeholder, matching the oracle's coalesce over GROUP BY ROLLUP."""
    ds = read_transcripts(sf_dir, columns=["text", "tool"])
    rows = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity",), keep=("severity", "tool")),
    )
    fine = grouped_count(rows, ["severity", "tool"]).to_pandas()
    # Guard the placeholder assumption (ADVICE r4): a NULL or literal 'ALL'
    # severity/tool value would collide with the rollup sentinel (the oracle
    # coalesces both to 'ALL', merging rows this pipeline would keep apart).
    # Cheap — `fine` is the bounded |severities|×|tools| table.
    for col in ("severity", "tool"):
        vals = fine[col]
        if vals.isna().any() or (vals == ROLLUP_ALL).any():
            raise ValueError(
                f"severity_tool_rollup: {col} contains NULL or the literal "
                f"{ROLLUP_ALL!r}, which collides with the rollup placeholder"
            )
    sev = fine.groupby("severity", as_index=False)["cnt"].sum()
    sev["tool"] = ROLLUP_ALL
    total = pd.DataFrame(
        {"severity": [ROLLUP_ALL], "tool": [ROLLUP_ALL],
         "cnt": [int(fine["cnt"].sum())]}
    )
    out = pd.concat([fine, sev, total], ignore_index=True)
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values(["severity", "tool"]).reset_index(drop=True)[
        ["severity", "tool", "cnt"]
    ]


# --- error-burst detection (gaps-and-islands over the parsed stream) ----------

_BURST_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("max_run", pa.int64()),
    ("n_error_turns", pa.int64()),
])


def _burst_block(batch: pa.Table) -> pa.Table:
    """Run-length stats for one conv-exclusive partition of error turns.
    A "run" is a maximal set of error-or-worse turns with CONSECUTIVE
    turn_idx values (turn_idx arithmetic, so the definition is identical
    on the SQL side: grp = turn_idx - row_number()). Fully vectorized:
    lexsort, boundary diff, reduceat."""
    import numpy as np

    if batch.num_rows == 0:
        return _BURST_SCHEMA.empty_table()
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((turn, conv))
    conv, turn = conv[order], turn[order]
    new_run = np.concatenate(
        ([True], (conv[1:] != conv[:-1]) | (turn[1:] != turn[:-1] + 1))
    )
    run_starts = np.flatnonzero(new_run)
    run_len = np.diff(np.append(run_starts, conv.size))
    run_conv = conv[run_starts]
    # per-conv reduce over the (already conv-sorted) run table
    conv_starts = np.flatnonzero(
        np.concatenate(([True], run_conv[1:] != run_conv[:-1]))
    )
    max_run = np.maximum.reduceat(run_len, conv_starts)
    n_err = np.add.reduceat(run_len, conv_starts)
    return pa.table({
        "conv_id": pa.array(run_conv[conv_starts], type=pa.string()),
        "max_run": pa.array(max_run, type=pa.int64()),
        "n_error_turns": pa.array(n_err, type=pa.int64()),
    }).cast(_BURST_SCHEMA)


def conv_error_bursts(sf_dir: str) -> Dataset:
    """Error-burst report: per conversation, the longest run of consecutive
    error-or-worse turns and the total error-turn count — the transcript
    incident-triage view of the reference's error listing (`pgweasel
    errors`, filters/mod.rs min-severity chain): a burst of adjacent error
    turns is one incident, scattered singletons are noise.

    Scale shape: parse + severity filter FIRST (only error rows — a small
    fraction of the stream — reach the shuffle), then one hash partition
    by conv_id and a single vectorized gaps-and-islands pass per
    partition. Bounded |convs|-row output, all-int64 measures."""
    from .dataprep import _keyed_blocks

    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    errs = ds.map_batches(
        parse_filter_project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(groups=("severity",), min_rank=ERROR_RANK,
                       keep=("conv_id", "turn_idx")),
    ).materialize()
    out = _keyed_blocks(errs, ["conv_id"], _burst_block)
    return out.sort("conv_id")
