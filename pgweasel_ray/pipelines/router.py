"""Fan-out router: severity- and tool-partitioned Parquet sinks with
per-shard lineage manifest and idempotent resume.

The reference's "router" is stdout in file order
(/root/reference/src/output_results/mod.rs:201-203); at 10^12-turn scale the
equivalent is a partitioned Parquet layout:

    out/shard=K/severity=<sev>/tool=<tool>/*.parquet

- **Shard** = a deterministic group of input files (the resume unit). A rerun
  consults the manifest and skips shards already committed; a crashed shard
  is rewritten from scratch (its directory is cleared first, so the write is
  idempotent, not append-duplicating).
- **Within a shard** rows are sorted by (conv_id, turn_idx) before the write
  so routed output has stable turn ordering (SURVEY.md §2.5 O4).
- **Partition columns** severity × tool give the fan-out the north_star asks
  for; at scale, low-cardinality severity partitions are kept from exploding
  into tiny files because each shard writes its own directory tree (file
  count ∝ shards × partitions, independent of total rows).
- Every shard commit records input files, row count, per-severity counts and
  wall time in the manifest (state/manifest.py).
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.dataset as pads

from . import common
from ..sources import lookups
from ..sources.transcripts import ensure_fixture, fixture_dir
from ..stages.enrich import EnrichStage
from ..stages.parse import parse_batch
from ..state.manifest import Manifest

# severity (partition key + floor), duration_ms (small float). ``message``
# is deliberately NOT routed: it is a substring of ``text`` (derivable at
# read with one regex) and shipping it would ~1.5× the shuffle bytes.
ROUTED_SCHEMA_GROUPS = ("severity", "duration")


def _input_files(sf_dir: str) -> list[str]:
    root = ensure_fixture(sf_dir)
    if root.is_dir():
        return sorted(str(p) for p in root.glob("*.parquet"))
    return [str(root)]


def _shards(files: list[str], num_shards: int) -> list[list[str]]:
    num_shards = max(1, min(num_shards, len(files)))
    return [files[i::num_shards] for i in range(num_shards)]


def route(
    sf_dir: str,
    out_dir: str | Path | None = None,
    num_shards: int = 4,
    enrich: bool = True,
    salt: int | None = None,
) -> Manifest:
    """Run (or resume) the routed sink for ``sf_dir``; returns the manifest."""
    import ray
    import ray.data

    out_root = Path(out_dir) if out_dir else fixture_dir(sf_dir) / "routed"
    manifest = Manifest(out_root / "MANIFEST.json")

    if enrich:
        role_ref = ray.put(lookups.load_map(sf_dir, "role_tenant"))
        tool_ref = ray.put(lookups.load_map(sf_dir, "tool_subsystem"))

    for i, shard_files in enumerate(_shards(_input_files(sf_dir), num_shards)):
        key = f"shard={i}"
        shard_dir = out_root / key
        if manifest.is_done(key, shard_dir):
            continue
        t0 = time.monotonic()
        if shard_dir.exists():
            shutil.rmtree(shard_dir)  # idempotent rewrite, never append-dup

        # NOTE: a Dataset snapshots the DataContext at creation, so the
        # hash-shuffle scope must start before read_parquet.
        with _hash_shuffle():
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            ds = ray.data.read_parquet(
                shard_files,
                override_num_blocks=max(n_cpus, len(shard_files)),
            )
            ds = ds.map_batches(
                parse_batch, batch_format="pyarrow", zero_copy_batch=True,
                fn_kwargs={"groups": ROUTED_SCHEMA_GROUPS},
            )
            if enrich:
                ds = ds.map_batches(
                    EnrichStage,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    fn_constructor_args=(role_ref, tool_ref),
                    concurrency=(1, 8),
                )
        # Keyed HASH repartition on the partition columns: every (severity,
        # tool) combination lands wholly inside one output block, so the
        # partitioned write produces ~one file per partition per shard
        # instead of blocks×partitions tiny files (measured: 96 files vs
        # ~9000 for 4M rows), and the exchange is a hash shuffle, not a
        # global sort (measured 4× faster). A full sort would also
        # co-locate partitions but cannot scale: its merge is ordered.
        # Within each block a LOCAL sort restores the stable
        # (conv_id, turn_idx) turn order per partition (SURVEY §2.5 O4).
        # Skew note: one hot (severity, tool) pair (e.g. log×client_backend)
        # hashes to one aggregator; ``salt=S`` adds hash(conv_id) % S to the
        # repartition keys so a hot pair spreads over S aggregators — the
        # partition-dir CONTENTS are unchanged (asserted in test_router)
        # because the salt never reaches the write: per-partition turn
        # order comes from the local sort that runs after the exchange,
        # and the hive layout keys stay (severity, tool).
            keys = ["severity", "tool"]
            if salt:
                ds = ds.map_batches(
                    _add_salt, batch_format="pyarrow", zero_copy_batch=True,
                    fn_kwargs={"salt": salt},
                )
                keys = keys + ["_salt"]
            ds = ds.repartition(
                _num_partitions(shard_files, n_cpus), keys=keys, sort=False
            )
            ds = ds.map_batches(
                _local_sort, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None, fn_kwargs={"drop_salt": bool(salt)},
            )
            ds.write_parquet(str(shard_dir), partition_cols=["severity", "tool"])

        rows, by_severity = _written_counts(shard_dir)
        manifest.commit(
            key,
            rows=rows,
            inputs=shard_files,
            wall_s=time.monotonic() - t0,
            extra={"by_severity": by_severity},
        )
    return manifest


TARGET_PARTITION_BYTES = 16 * 1024 * 1024  # parquet bytes per aggregator


def _num_partitions(shard_files: list[str], n_cpus: int) -> int:
    """Aggregator partition count for the keyed repartition, sized by DATA
    not just CPUs: one 1-CPU aggregator actor per partition competes with
    the parse/enrich maps it depends on, so small inputs want few
    partitions (measured 3.0s vs 3.5s at 600k turns / 32 cpus with 8 vs
    32), while large inputs need enough partitions to keep the local-sort +
    write fan-out parallel (measured 11.4s vs 9.9s at 4M turns / 16 cpus
    with 4 vs 16). floor max(4, cpus/4); ceiling 4×cpus."""
    import os

    input_bytes = sum(os.path.getsize(f) for f in shard_files)
    by_data = input_bytes // TARGET_PARTITION_BYTES
    return int(min(max(by_data, max(4, n_cpus // 4)), 4 * n_cpus))


def _local_sort(batch: pa.Table, drop_salt: bool = False) -> pa.Table:
    if drop_salt:
        batch = batch.drop_columns(["_salt"])
    return batch.sort_by(
        [("severity", "ascending"), ("tool", "ascending"),
         ("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


def _add_salt(batch: pa.Table, salt: int) -> pa.Table:
    """Deterministic hot-key salt: hash(conv_id) % salt (vectorized polars
    xxhash) — splits a hot (severity, tool) pair across ``salt``
    aggregators while keeping all turns of one conversation together."""
    import numpy as np
    import polars as pl

    h = pl.from_arrow(batch["conv_id"]).hash(seed=0).to_numpy()
    s = (h % np.uint64(salt)).astype(np.int64)
    return batch.append_column("_salt", pa.array(s, type=pa.int64()))


# keyed repartition requires the hash-shuffle strategy, scoped around the
# pipeline build (shared with pipelines that hash-partition by key)
_hash_shuffle = common.hash_shuffle


def _written_counts(shard_dir: Path) -> tuple[int, dict[str, int]]:
    """Row counts from the written files' parquet footers (validates the sink
    bytes, costs metadata reads only)."""
    import pyarrow.parquet as pq

    total, by_severity = 0, {}
    for f in shard_dir.rglob("*.parquet"):
        n = pq.read_metadata(f).num_rows
        total += n
        sev = next(
            (p.split("=", 1)[1] for p in f.parts if p.startswith("severity=")),
            "unknown",
        )
        by_severity[sev] = by_severity.get(sev, 0) + n
    return total, by_severity


def routed_counts(sf_dir: str, **route_kwargs):
    """Severity → row count of the routed sink, from the committed manifest
    (runs/resumes the router first). Oracle-checkable: must equal a plain
    GROUP BY over the input."""
    import pandas as pd

    manifest = route(sf_dir, **route_kwargs)
    agg: dict[str, int] = {}
    for e in manifest.entries.values():
        for sev, n in e.get("by_severity", {}).items():
            agg[sev] = agg.get(sev, 0) + n
    return (
        pd.DataFrame({"severity": list(agg), "cnt": list(agg.values())})
        .sort_values("severity")
        .reset_index(drop=True)
    )


def read_routed(sf_dir: str, out_dir: str | Path | None = None):
    """Read the routed dataset back (hive partition discovery)."""
    import ray.data

    out_root = Path(out_dir) if out_dir else fixture_dir(sf_dir) / "routed"
    shard_dirs = sorted(str(p) for p in out_root.glob("shard=*"))
    return ray.data.read_parquet(
        shard_dirs, dataset_kwargs={"partitioning": pads.partitioning(flavor="hive")}
    )
