"""DedupIndexShard state-layer tests (round 4): the shard's committed /
pending state must be flat sorted numpy (no Python dict of bytes keys —
the ~100 B/entry CPython overhead was the first OOM at 10^10 keys), its
byte footprint must sit near the documented 24 B/distinct key, and the
round protocol must stay equivalent to the obvious dict reference."""

from __future__ import annotations

import numpy as np

from pgweasel_ray.state.dedup_index import _DedupIndexShardImpl


def _rand_round(rng, n, key_space):
    h1 = rng.integers(0, key_space, n).astype(np.int64)
    h2 = (h1 * 7 + 1).astype(np.int64)       # h2 is a function of h1 here;
    ids = rng.integers(0, 10**9, n).astype(np.int64)
    # pre-fold like _fold_batch does: distinct keys, min id
    order = np.lexsort((ids, h2, h1))
    h1, h2, ids = h1[order], h2[order], ids[order]
    first = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
    return h1[first], h2[first], ids[first]


class DictReference:
    """The round-3 dict semantics, kept as the test oracle."""

    def __init__(self):
        self.committed: dict[tuple, int] = {}
        self.pending: dict[tuple, int] = {}

    def offer(self, h1, h2, ids):
        for a, b, i in zip(h1, h2, ids):
            k = (int(a), int(b))
            if k not in self.pending or i < self.pending[k]:
                self.pending[k] = int(i)

    def survivors(self, h1, h2, ids):
        out = np.zeros(len(ids), dtype=bool)
        for j, (a, b, i) in enumerate(zip(h1, h2, ids)):
            k = (int(a), int(b))
            if k not in self.committed and self.pending.get(k) == i:
                out[j] = True
        return out

    def commit(self):
        for k, i in self.pending.items():
            self.committed.setdefault(k, i)
        self.pending.clear()
        return len(self.committed)


def test_shard_matches_dict_reference_across_rounds():
    rng = np.random.default_rng(42)
    shard, ref = _DedupIndexShardImpl(), DictReference()
    for rnd in range(5):
        offers = [_rand_round(rng, 400, 300) for _ in range(3)]
        for h1, h2, ids in offers:
            shard.offer(h1, h2, ids)
            ref.offer(h1, h2, ids)
        # at-least-once retries: re-offer one batch, must be harmless
        h1, h2, ids = offers[0]
        shard.offer(h1, h2, ids)
        ref.offer(h1, h2, ids)
        for h1, h2, ids in offers:
            got = shard.survivors(h1, h2, ids)
            want = ref.survivors(h1, h2, ids)
            np.testing.assert_array_equal(got, want)
        assert shard.commit() == ref.commit()
    # commit with empty pending is a pure size read
    assert shard.commit() == len(ref.committed)


def test_shard_has_no_per_key_python_state():
    shard = _DedupIndexShardImpl()
    rng = np.random.default_rng(1)
    n = 200_000
    h1 = rng.integers(0, 2**62, n).astype(np.int64)
    h2 = rng.integers(0, 2**62, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    shard.offer(h1, h2, ids)
    n_committed = shard.commit()
    assert n_committed == len(np.unique(h1 * 3 + h2)) or n_committed <= n
    # byte footprint: committed keys+vals near 24 B per distinct key
    nbytes = shard.state_nbytes()
    assert nbytes <= 25 * n_committed + 4096, (nbytes, n_committed)
    # and the state is numpy, not a dict
    assert not any(isinstance(v, dict) and v for v in vars(shard).values())


def test_shard_lookup_of_unoffered_keys_is_false():
    shard = _DedupIndexShardImpl()
    h1 = np.array([1, 2], dtype=np.int64)
    h2 = np.array([3, 4], dtype=np.int64)
    ids = np.array([10, 20], dtype=np.int64)
    out = shard.survivors(h1, h2, ids)
    assert not out.any()


def test_fleet_size_scales_with_cluster_and_results_are_invariant(tmp_path):
    """Shard count comes from the cluster when unspecified, and forcing
    two different counts yields identical survivors (sharding only
    partitions the key space)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from pgweasel_ray.pipelines.dataprep import dedup_incremental
    from pgweasel_ray.state.dedup_index import (IncrementalDeduper,
                                                default_n_shards)

    assert ray.is_initialized()
    cpus = int(ray.cluster_resources()["CPU"])
    assert default_n_shards() == max(2, cpus // 4)
    assert len(IncrementalDeduper().shards) == default_n_shards()

    texts = ["dup one", "dup one", "two words here", "dup one",
             "four", "two words here", "five unique words in here"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    outs = []
    for n in (2, 5):
        import pgweasel_ray.pipelines.dataprep as dp
        import pgweasel_ray.state.dedup_index as di

        from unittest import mock

        with mock.patch.object(di, "default_n_shards", lambda: n):
            outs.append(dedup_incremental(str(tmp_path)))
    assert outs[0]["doc_id"].tolist() == outs[1]["doc_id"].tolist() == [
        0, 2, 4, 6
    ]
