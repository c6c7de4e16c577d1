"""Incremental exact-dedup index — the SHARED MUTABLE INDEX case.

Everything else in this engine is a stateless Dataset transform; an
index that must persist ACROSS ingest rounds (new shards arriving over
time must dedup against everything already committed) is the one shape
`ray.data` cannot express, so this module drops to raw Ray actors — a
hash-sharded fleet of `DedupIndexShard`s, each owning the (h1, h2) →
min-doc_id state for its key range.

Round protocol (deterministic under task retries and arbitrary batch
interleaving):

1. **offer** — every batch of the round min-folds its (hash, id) pairs
   into the shard's PENDING map. Idempotent (min is), so Ray's
   at-least-once map-task retries are harmless.
2. **lookup** — after all offers landed (materialize barrier), each
   batch asks: keep doc iff its hash is NOT in any committed round AND
   its id IS the round's pending minimum for that hash. No race: lookup
   mutates nothing.
3. **commit** — pending merges into committed (committed wins: an
   earlier round's survivor permanently owns the hash), pending clears.

When rounds arrive in doc_id order the final survivor set provably
equals one-shot exact dedup (min id per text) — which is how
`dedup_incremental` gets a full SQL oracle despite being stateful.

Scale: state is 24 bytes per DISTINCT document spread over n_shards
actors (pick n_shards ~ cluster nodes; shards are independent, so the
fleet scales horizontally). Batches pre-fold duplicates with np.unique
before the actor call, and each call ships only that batch's slice for
the one shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

DEFAULT_N_SHARDS = 8


@ray.remote(num_cpus=0.25)
class DedupIndexShard:
    """One hash shard of the cross-round index."""

    def __init__(self):
        self._committed: dict[bytes, int] = {}
        self._pending: dict[bytes, int] = {}

    @staticmethod
    def _keys(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        k = np.empty(len(h1), dtype=[("a", "<i8"), ("b", "<i8")])
        k["a"], k["b"] = h1, h2
        return k.view("V16")

    def offer(self, h1: np.ndarray, h2: np.ndarray,
              ids: np.ndarray) -> None:
        """Min-fold (hash, id) pairs into pending. Caller pre-folds the
        batch with np.unique, so the dict loop touches distinct keys."""
        pend = self._pending
        keys = self._keys(h1, h2)
        for key, i in zip(keys, ids):
            kb = key.tobytes()
            prev = pend.get(kb)
            if prev is None or i < prev:
                pend[kb] = int(i)

    def survivors(self, h1: np.ndarray, h2: np.ndarray,
                  ids: np.ndarray) -> np.ndarray:
        com, pend = self._committed, self._pending
        keys = self._keys(h1, h2)
        out = np.zeros(len(ids), dtype=bool)
        for j, (key, i) in enumerate(zip(keys, ids)):
            kb = key.tobytes()
            if kb not in com and pend.get(kb) == i:
                out[j] = True
        return out

    def commit(self) -> int:
        com = self._committed
        for kb, i in self._pending.items():
            if kb not in com:          # earlier rounds always win
                com[kb] = i
        self._pending.clear()
        return len(com)


def _fold_batch(batch: pa.Table):
    """(h1, h2, min id) per distinct hash in the batch + shard routing."""
    h1 = batch["h1"].to_numpy(zero_copy_only=False)
    h2 = batch["h2"].to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, h2, h1))
    h1, h2, ids = h1[order], h2[order], ids[order]
    first = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
    return h1[first], h2[first], ids[first]


def _offer_batch(batch: pa.Table, shards: list) -> pa.Table:
    h1, h2, ids = _fold_batch(batch)
    n = len(shards)
    route = (h1 % n + n) % n
    refs = [
        shards[s].offer.remote(h1[m], h2[m], ids[m])
        for s in range(n)
        if (m := route == s).any()
    ]
    ray.get(refs)
    return pa.table({"offered": pa.array([batch.num_rows], pa.int64())})


def _survivor_batch(batch: pa.Table, shards: list) -> pa.Table:
    h1 = batch["h1"].to_numpy(zero_copy_only=False)
    h2 = batch["h2"].to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(shards)
    route = (h1 % n + n) % n
    keep = np.zeros(len(ids), dtype=bool)
    masks, refs = [], []
    for s in range(n):
        m = route == s
        if m.any():
            masks.append(m)
            refs.append(shards[s].survivors.remote(h1[m], h2[m], ids[m]))
    for m, r in zip(masks, ray.get(refs)):
        keep[m] = r
    return pa.table({"doc_id": pa.array(ids[keep], type=pa.int64())})


class IncrementalDeduper:
    """Driver-side handle over the shard fleet; one ``add_round`` per
    arriving data increment."""

    def __init__(self, n_shards: int = DEFAULT_N_SHARDS):
        self.shards = [DedupIndexShard.remote() for _ in range(n_shards)]

    def add_round(self, hashed_ds) -> pd.DataFrame:
        """hashed_ds: Dataset with (doc_id, h1, h2) columns (the
        _content_hash output). Returns this round's survivors as a
        doc_id DataFrame; commits the round into the index."""
        mat = hashed_ds.materialize()
        # phase 1 barrier: every offer landed before any lookup
        mat.map_batches(
            _offer_batch, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"shards": self.shards},
        ).materialize()
        surv = mat.map_batches(
            _survivor_batch, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"shards": self.shards},
        ).to_pandas()
        ray.get([s.commit.remote() for s in self.shards])
        return surv

    def committed_size(self) -> int:
        # commit() with empty pending is a pure size read
        return sum(ray.get([s.commit.remote() for s in self.shards]))
