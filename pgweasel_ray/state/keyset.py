"""Hash-sharded distributed key-set — vectorized membership lookup.

The unbounded-size companion to the `ray.put` broadcast pattern: when a
lookup side (e.g. the flagged-boilerplate chunk hashes in
``docs_strip_boilerplate``) can exceed what one worker heap should hold,
the keys are sharded by hash across a small actor fleet instead. Each
shard owns a sorted int64 array; a probe ships ONLY the batch's slice
for that shard and answers with one `searchsorted` pass — no Python
per-key loop, no full-set copy anywhere.

Build protocol: ``add_dataset`` streams the key column into the shards
(idempotent under Ray's at-least-once map-task retries because shards
de-duplicate on seal), then ``seal`` sorts + uniques once. Probes are
read-only after seal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

DEFAULT_N_SHARDS = 8


@ray.remote(num_cpus=0.25)
class KeySetShard:
    def __init__(self):
        self._parts: list[np.ndarray] = []
        self._keys: np.ndarray | None = None

    def add(self, arr: np.ndarray) -> None:
        self._parts.append(np.asarray(arr, dtype=np.int64))

    def seal(self) -> int:
        parts = self._parts or [np.empty(0, np.int64)]
        self._keys = np.unique(np.concatenate(parts))
        self._parts = []
        return len(self._keys)

    def contains(self, arr: np.ndarray) -> np.ndarray:
        k = self._keys
        out = np.zeros(len(arr), dtype=bool)
        if k is None or not len(k):
            return out
        i = np.searchsorted(k, arr)
        ok = i < len(k)
        out[ok] = k[i[ok]] == arr[ok]
        return out


def _route(arr: np.ndarray, n: int) -> np.ndarray:
    return (arr % n + n) % n


def _add_batch(batch: pa.Table, shards: list, col: str) -> pa.Table:
    arr = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
    route = _route(arr, len(shards))
    refs = [
        shards[s].add.remote(np.unique(arr[m]))
        for s in range(len(shards))
        if (m := route == s).any()
    ]
    ray.get(refs)
    return pa.table({"added": pa.array([batch.num_rows], pa.int64())})


class ShardedKeySet:
    """Driver/worker-side handle over the shard fleet. Picklable into
    map_batches fn_kwargs (actor handles serialize). ``n_shards=None``
    sizes the fleet from the cluster (state/dedup_index.default_n_shards
    — one shard per ~4 CPUs, horizontal at real scale)."""

    def __init__(self, n_shards: int | None = None):
        if n_shards is None:
            from .dedup_index import default_n_shards

            n_shards = default_n_shards()
        self.shards = [KeySetShard.remote() for _ in range(n_shards)]

    def add_dataset(self, ds, col: str) -> int:
        """Stream ``ds[col]`` (int64) into the shards and seal. Returns
        the sealed distinct-key count."""
        ds.map_batches(
            _add_batch, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"shards": self.shards, "col": col},
        ).materialize()
        return sum(ray.get([s.seal.remote() for s in self.shards]))

    def contains(self, arr: np.ndarray) -> np.ndarray:
        n = len(self.shards)
        route = _route(arr, n)
        out = np.zeros(len(arr), dtype=bool)
        masks, refs = [], []
        for s in range(n):
            m = route == s
            if m.any():
                masks.append(m)
                refs.append(self.shards[s].contains.remote(arr[m]))
        for m, r in zip(masks, ray.get(refs)):
            out[m] = r
        return out
