"""Training-shard export: the composed end of the corpus pipeline.

``corpus_export`` runs the full prep recipe (quality → exact dedup →
MinHash near-dedup → decontamination, :func:`dataprep.corpus_prep_ds`),
joins the surviving text back, assigns every doc its deterministic
training-shuffle position, and writes ``num_shards`` GLOBALLY ORDERED
parquet shards:

    out/shard=K/shard.parquet       rows sorted by shuffle key; all keys in
                                    shard K precede all keys in shard K+1

The global shuffle order is the rank of the affine key (hashing.SHUF_A — a
bijection on [0, P)), exactly as :func:`dataprep.docs_shuffle_order`
computes it; here it is realized as a SHARDED LAYOUT rather than a rank
column: shard = key * num_shards // P is a RANGE partition of the key
space, so reading shard files in shard order replays the shuffled corpus
without any global sort operator ever running — the write-then-compact
exchange (pipelines/router.py pattern) moves the data through storage:

- phase A (map-only): each survivors block computes key+shard, sorts
  itself by key, and writes hive fragments ``shard=K/frag-*.parquet``
  with deterministic content-derived names (at-least-once task retries
  overwrite their own files instead of duplicating rows);
- phase B (map-only): one task per shard k-way-merges its sorted
  fragments into a single sorted file, memory bounded by
  fragments × merge-batch rows, never shard size;
- every shard commit lands in a lineage manifest (state/manifest.py)
  with row count and key range; the run validates compacted rows ==
  phase-A rows before committing (a mid-write crash reruns cleanly).

The affine-key shuffle is uniform, so shards are balanced by construction
(no hot key range); at 10^12 docs, num_shards scales to the cluster and
each shard's merge stays a single bounded-memory task.
"""

from __future__ import annotations

import hashlib
import shutil
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
from ray.data import Dataset

from .. import hashing as H
from ..state.manifest import Manifest
from . import dataprep

EXPORT_SHARDS = 8               # fixed default so tests/oracle are stable
MERGE_BATCH_ROWS = 128 * 1024   # k-way-merge read granularity
COMPACT_BUDGET_BYTES = 256 * 1024 * 1024


def shard_of(key: np.ndarray, num_shards: int) -> np.ndarray:
    """Range partition of the key space [0, P): shard K owns keys in
    [K*P/S, (K+1)*P/S). Integer math — identical in the DuckDB oracle."""
    return (key * np.int64(num_shards)) // np.int64(H.P)


def _semi_filter(batch: pa.Table, ids_ref) -> pa.Table:
    import ray

    keep = ray.get(ids_ref) if not isinstance(ids_ref, np.ndarray) else ids_ref
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(np.isin(ids, keep)))


def _semi_join_docs(docs: Dataset, ids: Dataset, n_ids: int) -> Dataset:
    """docs ⋉ ids on doc_id: broadcast the id set below the same threshold
    the dedup anti-joins use; hash-partitioned Dataset.join above it."""
    import ray

    if n_ids <= dataprep.BROADCAST_ANTI_MAX:
        arr = np.sort(
            ids.to_pandas()["doc_id"].to_numpy().astype(np.int64)
        )
        ref = ray.put(arr)
        return docs.map_batches(
            _semi_filter, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"ids_ref": ref},
        )
    right = ids.map_batches(
        dataprep._coerce_id_schema, batch_format="pandas",
        fn_kwargs={"id_col": "doc_id"},
    )
    return docs.join(
        right, join_type="inner", on=("doc_id",),
        num_partitions=dataprep._join_partitions(n_ids),
    )


def _write_export_fragments(batch: pa.Table, frag_root: str,
                            num_shards: int) -> pa.Table:
    """Phase A map body: key+shard columns, block-local sort by key, hive
    fragment write. Deterministic fragment names (first key + row count —
    keys are unique across the dataset and blocks are disjoint) make
    at-least-once retries overwrite rather than duplicate, as in
    router._write_fragments."""
    if batch.num_rows == 0:
        return pa.table({"n": pa.array([0], type=pa.int64())})
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    key = (((ids % H.P) * H.SHUF_A + H.SHUF_B) % H.P).astype(np.int64)
    batch = batch.append_column("key", pa.array(key, type=pa.int64()))
    batch = batch.append_column(
        "shard",
        pa.array(shard_of(key, num_shards), type=pa.int64()),
    )
    batch = batch.sort_by([("key", "ascending")])
    name = (f"{batch['key'][0].as_py()}|{batch.num_rows}").encode()
    h = int.from_bytes(hashlib.blake2b(name, digest_size=8).digest(), "big")
    part = pads.partitioning(
        pa.schema([("shard", pa.int64())]), flavor="hive"
    )
    pads.write_dataset(
        batch, frag_root, format="parquet", partitioning=part,
        basename_template=f"frag-{h:016x}-{{i}}.parquet",
        existing_data_behavior="overwrite_or_ignore",
    )
    return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})


def _merge_sorted_by_key(frags: list[Path], out_file: Path,
                         batch_rows: int = MERGE_BATCH_ROWS) -> None:
    """Streaming k-way merge of key-sorted fragments (single int64 key,
    unique by construction). Footprint: one batch_rows buffer per fragment
    plus one emit chunk — a hot shard cannot OOM the merge task."""
    files = [pq.ParquetFile(f) for f in frags]
    schema = files[0].schema_arrow
    iters = [f.iter_batches(batch_size=batch_rows) for f in files]
    bufs: list[pa.Table | None] = [None] * len(files)

    def refill(i: int) -> None:
        while bufs[i] is None or bufs[i].num_rows == 0:
            nb = next(iters[i], None)
            if nb is None:
                bufs[i] = None
                return
            bufs[i] = pa.Table.from_batches([nb], schema)

    with pq.ParquetWriter(out_file, schema) as writer:
        for i in range(len(files)):
            refill(i)
        while True:
            active = [i for i, b in enumerate(bufs) if b is not None]
            if not active:
                break
            if len(active) == 1:
                i = active[0]
                while bufs[i] is not None:
                    writer.write_table(bufs[i])
                    bufs[i] = None
                    refill(i)
                break
            # every buffered row <= the min of the buffers' LAST keys can
            # be emitted (any future row of fragment i >= its buffer's
            # last key >= that min; keys unique so no boundary ties)
            bound = min(bufs[i]["key"][-1].as_py() for i in active)
            chunks = []
            for i in active:
                b = bufs[i]
                cut = int(pc.sum(pc.less_equal(b["key"], bound)).as_py() or 0)
                if cut:
                    chunks.append(b.slice(0, cut))
                bufs[i] = b.slice(cut)
                refill(i)
            emit = pa.concat_tables(chunks).sort_by([("key", "ascending")])
            writer.write_table(emit)


def _compact_shard(batch, frag_root: str, out_root: str):
    """Phase B map body (one row per shard dir): merge that shard's
    sorted fragments into shard.parquet. Small shards concat-sort in
    memory; larger ones stream through the k-way merge."""
    rels = batch["rel"] if isinstance(batch, dict) else batch["rel"].to_pylist()
    for rel in list(rels):
        src = Path(frag_root) / rel
        frags = sorted(src.glob("*.parquet"))
        dest = Path(out_root) / rel
        dest.mkdir(parents=True, exist_ok=True)
        out_file = dest / "shard.parquet"
        if sum(f.stat().st_size for f in frags) <= COMPACT_BUDGET_BYTES:
            t = pa.concat_tables(pq.read_table(f) for f in frags)
            pq.write_table(t.sort_by([("key", "ascending")]), out_file)
        else:
            _merge_sorted_by_key(frags, out_file)
    return pa.table({"n": pa.array([len(list(rels))], type=pa.int64())})


def corpus_export(sf_dir: str, out_dir: str | Path,
                  num_shards: int = EXPORT_SHARDS) -> Manifest:
    """Run the full prep recipe and write the surviving corpus as
    ``num_shards`` globally-ordered training shards (module docstring).
    Idempotent: an uncommitted (crashed) output dir is wiped and rebuilt;
    a fully committed one returns its manifest untouched."""
    import ray
    import ray.data

    out_root = Path(out_dir)
    manifest = Manifest(out_root / "MANIFEST.json")
    shard_keys = [f"shard={k}" for k in range(num_shards)]
    if all(manifest.is_done(k, out_root / k) for k in shard_keys):
        return manifest

    t0 = time.monotonic()
    for k in shard_keys:           # stale partial output: rebuild from scratch
        if (out_root / k).exists():
            shutil.rmtree(out_root / k)
    frag_root = out_root / "_frags"
    if frag_root.exists():
        shutil.rmtree(frag_root)
    frag_root.mkdir(parents=True)

    ids = dataprep.corpus_prep_ds(sf_dir).materialize()
    n_ids = ids.count()
    docs = dataprep._docs(sf_dir, ["doc_id", "text"])
    survivors = _semi_join_docs(docs, ids, n_ids)

    written = sum(
        r["n"]
        for r in survivors.map_batches(
            _write_export_fragments, batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"frag_root": str(frag_root),
                       "num_shards": num_shards},
        ).take_all()
    )

    rel_dirs = sorted(
        str(p.relative_to(frag_root)) for p in frag_root.glob("shard=*")
    )
    if rel_dirs:
        ray.data.from_items([{"rel": r} for r in rel_dirs]).map_batches(
            _compact_shard, batch_size=1,
            fn_kwargs={"frag_root": str(frag_root),
                       "out_root": str(out_root)},
        ).count()
    shutil.rmtree(frag_root)

    wall = time.monotonic() - t0
    stats = []
    for k in range(num_shards):
        f = out_root / f"shard={k}" / "shard.parquet"
        if f.exists():
            rows = pq.read_metadata(f).num_rows
            t = pq.read_table(f, columns=["key"])
            lo = pc.min(t["key"]).as_py() if rows else None
            hi = pc.max(t["key"]).as_py() if rows else None
        else:
            (out_root / f"shard={k}").mkdir(parents=True, exist_ok=True)
            rows, lo, hi = 0, None, None
        stats.append((k, rows, lo, hi))
    total = sum(s[1] for s in stats)
    if total != written:
        # validate BEFORE any manifest commit: a mismatch (e.g. a retried
        # task whose rerun split batches differently) must leave the whole
        # output uncommitted so the next run wipes and rebuilds it
        raise RuntimeError(
            f"corpus_export: compacted {total} rows but phase A wrote "
            f"{written}; output left for inspection, manifest incomplete"
        )
    for k, rows, lo, hi in stats:
        manifest.commit(
            f"shard={k}", rows=rows, inputs=[str(sf_dir)], wall_s=wall,
            extra={"key_min": lo, "key_max": hi},
        )
    return manifest


def corpus_export_counts(sf_dir: str,
                         out_dir: str | Path | None = None) -> pd.DataFrame:
    """(shard, cnt) of the exported corpus, from the written shard files'
    parquet footers — the oracle-checkable veneer that validates the SINK
    bytes, not just the plan (same contract as router.routed_counts)."""
    from ..sources.transcripts import fixture_dir

    out_root = Path(out_dir) if out_dir else fixture_dir(sf_dir) / "export"
    manifest = corpus_export(sf_dir, out_root)
    rows = []
    for key, e in manifest.entries.items():
        k = int(key.split("=", 1)[1])
        rows.append((k, int(e["rows"])))
    return (
        pd.DataFrame(rows, columns=["shard", "cnt"])
        .query("cnt > 0")
        .sort_values("shard")
        .reset_index(drop=True)
    )
