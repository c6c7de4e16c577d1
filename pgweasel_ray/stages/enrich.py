"""Broadcast-lookup enrich stage (stateful actor pool).

The reference's analogue is its per-filter-instance Aho-Corasick automata —
state built once and shared read-only across workers
(/root/reference/src/filters/locking_filter.rs:32-38). Here the stage is a
callable CLASS: Ray creates an actor pool, ``__init__`` runs once per actor
(lookup dicts arrive via ``fn_constructor_args`` — pass ``ray.put`` object
refs so the tables ship to each actor once through the object store, never
per batch), and ``__call__`` does a vectorized dictionary-encode join per
batch. This is the broadcast-join pattern: no shuffle, small side replicated.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

UNKNOWN = "unknown"


def _mapped(col: pa.ChunkedArray | pa.Array, keys: pa.Array, values: pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    idx = pc.index_in(col, value_set=keys)
    return pc.fill_null(pc.take(values, idx), UNKNOWN)


class EnrichStage:
    """Append ``tenant`` (from role) and ``subsystem`` (from tool) columns.

    Unmapped / null keys become "unknown" — same fallback convention as the
    connections aggregator's missing-kv handling (connections.rs:65,85-97).
    """

    def __init__(self, role_tenant, tool_subsystem):
        # fn_constructor_args ships ObjectRefs verbatim (Ray Data does NOT
        # auto-resolve them there) — ray.get here costs one object-store read
        # per actor, which is exactly the broadcast we want.
        import ray

        if isinstance(role_tenant, ray.ObjectRef):
            role_tenant = ray.get(role_tenant)
        if isinstance(tool_subsystem, ray.ObjectRef):
            tool_subsystem = ray.get(tool_subsystem)
        self._role_keys = pa.array(list(role_tenant), type=pa.string())
        self._role_vals = pa.array(list(role_tenant.values()), type=pa.string())
        self._tool_keys = pa.array(list(tool_subsystem), type=pa.string())
        self._tool_vals = pa.array(list(tool_subsystem.values()), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "tenant", _mapped(batch["role"], self._role_keys, self._role_vals)
        )
        batch = batch.append_column(
            "subsystem", _mapped(batch["tool"], self._tool_keys, self._tool_vals)
        )
        return batch
