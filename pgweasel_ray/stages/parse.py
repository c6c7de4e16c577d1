"""The parse stage: one zero-copy ``map_batches`` pass over Arrow batches.

Equivalent of pgweasel's lazy per-record byte scanning
(/root/reference/src/output_results/mod.rs:150-199 drives severity/timestamp
extraction; format/*.rs and duration.rs do the field scans), restated as an
explicit vectorized parse producing a fixed Arrow schema (SURVEY.md §1.2).

These are module-level plain functions (stateless tasks — cheap and elastic);
``fn_kwargs`` carries the field-group selection so each pipeline computes only
the columns it needs. RE2 compilation happens inside pyarrow per kernel call,
which is microseconds for these patterns — no actor pool needed here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import parse_table


def parse_batch(
    batch: pa.Table,
    groups: tuple[str, ...] | None = None,
    text_col: str = "text",
    fmt: str = "plain",
) -> pa.Table:
    return parse_table(batch, text_col=text_col, groups=groups, fmt=fmt)


def parse_filter_project(
    batch: pa.Table,
    groups: tuple[str, ...] | None = None,
    min_rank: int | None = None,
    require: tuple[tuple[str, str], ...] = (),
    contains: str | None = None,
    begin_us: int | None = None,
    end_us: int | None = None,
    keep: tuple[str, ...] | None = None,
    fmt: str = "plain",
) -> pa.Table:
    """Parse + predicate chain + projection in ONE pass over the batch.

    Predicate order mirrors the reference's short-circuit chain
    (output_results/mod.rs:157-191): mask(contains) → min-severity →
    begin/end time → extra column predicates. ``begin``/``end`` are inclusive
    bounds: the reference drops ``t < begin`` and ``t > end``
    (output_results/mod.rs:180-185).

    ``require`` is a tuple of (column, value) equality predicates on parsed
    columns (e.g. (("event", "received"),)); ``keep`` is the output
    projection.
    """
    import numpy as np

    batch = parse_table(batch, text_col="text", groups=groups, fmt=fmt)
    mask = pa.array(np.ones(batch.num_rows, dtype=bool))
    if contains is not None:
        mask = pc.and_(mask, pc.match_substring(batch["text"], contains))
    if min_rank is not None:
        mask = pc.and_(mask, pc.greater_equal(batch["severity_rank"], min_rank))
    if begin_us is not None:
        mask = pc.and_(
            mask, pc.greater_equal(pc.cast(batch["ts"], pa.int64()), begin_us)
        )
    if end_us is not None:
        mask = pc.and_(mask, pc.less_equal(pc.cast(batch["ts"], pa.int64()), end_us))
    for col, value in require:
        if value is None:
            mask = pc.and_(mask, batch[col])  # boolean column predicate
        else:
            mask = pc.and_(mask, pc.fill_null(pc.equal(batch[col], value), False))
    out = batch.filter(pc.fill_null(mask, False))
    if keep is not None:
        out = out.select(list(keep))
    return out


def bucket_ts_column(ts: pa.Array | pa.ChunkedArray, width_s: int) -> pa.Array:
    """Epoch-floor time bucket: ``(ts / width) * width`` with integer
    arithmetic, exactly ErrorHistogramAggregator::bucket
    (error_histogram.rs:21-30; the 10-min connections variant
    connections.rs:189-227 floors identically for post-epoch timestamps).
    Computed on epoch MICROseconds (equal to epoch-second flooring for
    positive timestamps and integer second widths)."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    width_us = width_s * 1_000_000
    us = pc.cast(ts, pa.int64())
    floored = pc.multiply(pc.divide(us, width_us), width_us)
    return pc.cast(floored, pa.timestamp("us"))


def add_bucket(batch: pa.Table, width_s: int, ts_col: str = "ts") -> pa.Table:
    return batch.append_column(
        "bucket_ts", bucket_ts_column(batch[ts_col], width_s)
    )
