"""User-extension surface — the reference's two plugin traits, Ray-shaped.

pgweasel composes ``Vec<Box<dyn Filter>>`` + ``Vec<Box<dyn Aggregator>>``
per subcommand (filters/mod.rs:13-15, aggregators/mod.rs:16-28,
main.rs:75-76,135-163) and hands them to ``output_results``. Here the same
two hooks exist as batch-vectorized protocols:

- a **Predicate** maps a ``pyarrow.Table`` batch → boolean mask
  (pc.*/numpy inside; never per-row Python);
- an **Aggregation** declares the parsed columns it needs and reduces a
  filtered Dataset (typically via ``common.grouped_count`` or a Ray
  ``AggregateFn``).

``run(...)`` is the ``output_results`` equivalent: one fused
parse+predicate map_batches pass feeding every aggregation.
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .kernels import PARSE_GROUPS, parse_table
from .sources.transcripts import read_transcripts


@runtime_checkable
class Predicate(Protocol):
    """Batch → boolean mask. Equivalent of Filter::matches
    (filters/mod.rs:13-15), vectorized."""

    #: parse field groups this predicate needs (keys of kernels.PARSE_GROUPS)
    groups: tuple[str, ...]

    def mask(self, batch: pa.Table) -> pa.Array: ...


@runtime_checkable
class Aggregation(Protocol):
    """Filtered Dataset → result Dataset/DataFrame. Equivalent of the
    Aggregator trait's update/merge pair (aggregators/mod.rs:16-28) — Ray
    Data's partial+final aggregation replaces clone/merge_box."""

    groups: tuple[str, ...]

    def apply(self, ds: Dataset): ...


class RegexPredicate:
    """Keep records matching an RE2 pattern (the shape of F5/F6)."""

    groups: tuple[str, ...] = ()

    def __init__(self, pattern: str):
        self.pattern = pattern

    def mask(self, batch: pa.Table) -> pa.Array:
        return pc.fill_null(
            pc.match_substring_regex(batch["text"], self.pattern), False
        )


class MinSeverity:
    """The built-in severity floor as a Predicate (F1)."""

    groups = ("severity",)

    def __init__(self, min_rank: int):
        self.min_rank = min_rank

    def mask(self, batch: pa.Table) -> pa.Array:
        return pc.greater_equal(batch["severity_rank"], self.min_rank)


class GroupedCount:
    """count(*) by a parsed column — the A1/A2 shape as an Aggregation."""

    def __init__(self, key: str, groups: tuple[str, ...] = ()):
        self.key = key
        self.groups = groups

    def apply(self, ds: Dataset):
        from .pipelines.common import grouped_count

        return grouped_count(ds.select_columns([self.key]), [self.key])


def _parse_and_filter(
    batch: pa.Table, groups: tuple[str, ...], predicates: list[Predicate]
) -> pa.Table:
    batch = parse_table(batch, groups=groups)
    mask = None
    for p in predicates:  # short-circuit chain order, mod.rs:157-191
        m = p.mask(batch)
        mask = m if mask is None else pc.and_(mask, m)
    return batch if mask is None else batch.filter(pc.fill_null(mask, False))


def run(
    sf_dir: str,
    predicates: list[Predicate] | None = None,
    aggregation: Aggregation | None = None,
    columns: list[str] | None = None,
):
    """Compose predicates + an aggregation over the transcript table — the
    ``output_results(args, min_severity, aggregators, filters)`` entry point
    (output_results/mod.rs:17-22) restated."""
    predicates = predicates or []
    groups = tuple(
        dict.fromkeys(
            g for p in predicates for g in p.groups
        ).keys()
    )
    if aggregation is not None:
        groups = tuple(dict.fromkeys(groups + tuple(aggregation.groups)))
    for g in groups:
        if g not in PARSE_GROUPS:
            raise ValueError(f"unknown parse group {g!r}")
    ds = read_transcripts(sf_dir, columns=columns or ["conv_id", "turn_idx", "text"])
    filtered = ds.map_batches(
        _parse_and_filter, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"groups": groups, "predicates": predicates},
    )
    return aggregation.apply(filtered) if aggregation else filtered
