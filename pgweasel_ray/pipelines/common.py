"""Shared distributed-aggregation helpers.

The reference's execution model is partial aggregation per thread-chunk with a
final merge (/root/reference/src/output_results/mod.rs:87-88,127-132). The
Ray-Data equivalent here is explicit two-phase aggregation: a per-batch
``pyarrow`` hash-aggregate inside ``map_batches`` (the "partial"), then a
``groupby().aggregate(Sum)`` over the tiny partials (the "final"). Only
pre-aggregated rows cross the shuffle — at 10^12 turns the all-to-all moves
per-block (key, count) pairs, not records. For hot keys (a Zipf message
dominating error top-N), the partial step IS the salt: every block combines
its own copies before the exchange, so the shuffle sees at most
``num_blocks × distinct_keys`` rows.
"""

from __future__ import annotations

import contextlib

import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum


@contextlib.contextmanager
def hash_shuffle():
    """Scope the HASH_SHUFFLE strategy (required for keyed ``repartition``)
    around a pipeline BUILD — a Dataset snapshots the DataContext at
    creation, so the scope must start before ``read_parquet``."""
    import os

    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    prev_cpus = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Aggregator actors default to 1 whole CPU per partition; with
    # partitions == cluster CPUs they can reserve the whole of a small
    # cluster and starve the map/read tasks they depend on. Tunable via
    # PGWEASEL_AGG_CPUS (fractional); default leaves Ray's sizing.
    agg_cpus = os.environ.get("PGWEASEL_AGG_CPUS")
    if agg_cpus:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
            float(agg_cpus)
        )
    try:
        yield
    finally:
        ctx.shuffle_strategy = prev
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
            prev_cpus
        )


def _partial_count(batch: pa.Table, keys: list[str]) -> pa.Table:
    agg = batch.group_by(keys).aggregate([([], "count_all")])
    return agg.rename_columns(keys + ["cnt"])


def grouped_count(ds: Dataset, keys: list[str]) -> Dataset:
    """count(*) grouped by ``keys`` with per-block pre-aggregation.

    Result columns: ``keys + ["cnt"]`` (int64).
    """
    partials = ds.map_batches(
        _partial_count, batch_format="pyarrow", fn_kwargs={"keys": list(keys)}
    )
    return partials.groupby(list(keys)).aggregate(Sum("cnt", alias_name="cnt"))


def _salted_partial(batch: pa.Table, keys: list[str], salt: int) -> pa.Table:
    import numpy as np

    agg = batch.group_by(keys).aggregate([([], "count_all")])
    agg = agg.rename_columns(keys + ["cnt"])
    rng_free = np.arange(agg.num_rows, dtype=np.int64) % salt
    return agg.append_column("_salt", pa.array(rng_free, type=pa.int64()))


def grouped_count_salted(ds: Dataset, keys: list[str], salt: int = 16) -> Dataset:
    """Hot-key-safe grouped count: per-block partials carry an explicit salt
    column, the first shuffle groups by (keys + salt) so one hot key spreads
    over ``salt`` reducers, and a second (tiny) aggregate folds the salted
    partials. With the per-block pre-aggregation of :func:`grouped_count`
    the salt is usually redundant — this is the explicit salted-repartition
    path for keys hot enough that even the per-block partials overwhelm a
    single reducer (north_star: hot conv_ids at 10^12 turns)."""
    partials = ds.map_batches(
        _salted_partial, batch_format="pyarrow",
        fn_kwargs={"keys": list(keys), "salt": salt},
    )
    salted = partials.groupby(list(keys) + ["_salt"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )
    return salted.groupby(list(keys)).aggregate(Sum("cnt", alias_name="cnt"))


def _partial_sums(batch: pa.Table, cols: list[str]) -> pa.Table:
    import pyarrow.compute as pc

    return pa.table(
        {c: pa.array([pc.sum(batch[c]).as_py() or 0], type=pa.int64()) for c in cols}
    )


def global_sums(ds: Dataset, cols: list[str]) -> dict[str, int]:
    """Global sums of int columns via per-batch partials + one tiny final
    aggregate (no full-row shuffle)."""
    partials = ds.map_batches(
        _partial_sums, batch_format="pyarrow", fn_kwargs={"cols": list(cols)}
    )
    row = partials.aggregate(*[Sum(c, alias_name=c) for c in cols])
    return {c: int(row[c] or 0) for c in cols}
