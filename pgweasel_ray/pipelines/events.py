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
    return grouped_count(_events(sf_dir, ["event_type"]), ["event_type"])


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
    )


def events_value_range(sf_dir: str) -> Dataset:
    """min/max/count of value per event_type — order-independent aggregates
    (float SUM is deliberately avoided in oracle-checked queries: its result
    depends on reduction order)."""
    ds = _events(sf_dir, ["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
        Count(alias_name="cnt"),
    )
