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

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from . import common
from ..sources import lookups
from ..sources.transcripts import fixture_dir
from ..stages.enrich import enrich_batch
from ..stages.parse import parse_batch
from ..state.manifest import Manifest

# severity (partition key + floor), duration_ms (small float). ``message``
# is deliberately NOT routed: it is a substring of ``text`` (derivable at
# read with one regex) and shipping it would ~1.5× the shuffle bytes.
ROUTED_SCHEMA_GROUPS = ("severity", "duration")


def _input_files(sf_dir: str) -> list[str]:
    """Input resolution mirrors read_transcripts: a REAL transcripts
    parquet dir/file is routed as-is; raw pgweasel logs are ingested to
    parquet first (the router's unit of work is a parquet file); only
    sf-fixture names fall through to the deterministic fixture."""
    from ..sources.transcripts import resolve_input

    root = resolve_input(sf_dir)
    if root is None:  # raw log input: materialize the transcript schema
        import tempfile

        from ..sources.rawlog import ingest_to_transcripts

        root = Path(
            ingest_to_transcripts(
                str(sf_dir), tempfile.mkdtemp(prefix="pgweasel_ray_route_")
            )
        )
    root = Path(root)
    if root.is_dir():
        return sorted(str(p) for p in root.glob("*.parquet"))
    return [str(root)]


def _shards(files: list[str], num_shards: int) -> list[list[str]]:
    num_shards = max(1, min(num_shards, len(files)))
    return [files[i::num_shards] for i in range(num_shards)]


def _file_shards(files: list[str]) -> list[tuple[str, list[str]]]:
    """(shard key, files) with the key derived from the FILE NAME, not its
    position — the incremental-ingest unit: new files appearing later get
    new shard keys, existing keys keep their exact file association, so
    resume skips everything already committed regardless of arrival
    order."""
    return [(f"shard={Path(f).stem}", [f]) for f in files]


def route(
    sf_dir: str,
    out_dir: str | Path | None = None,
    num_shards: int = 4,
    enrich: bool = True,
    salt: int | None = None,
    exchange: str = "compact",
    shard_by: str = "index",
) -> Manifest:
    """Run (or resume) the routed sink for ``sf_dir``; returns the manifest.

    ``exchange`` selects how rows travel to their (severity, tool)
    partition:

    - ``"compact"`` (default): write-then-compact — every parse/enrich task
      splits its block by partition key and writes sorted FRAGMENT files
      directly (map-only, no inter-task data exchange); a second map-only
      pass merges each partition's fragments into one final sorted file.
      Data moves through the filesystem/object storage instead of the
      shuffle — the standard lakehouse compaction pattern. Measured: both
      passes scale near-linearly (the keyed hash exchange was the one
      stage at 0.71 efficiency 2→8 cpus; parse/enrich scale at 0.98).
    - ``"hash"``: keyed HASH repartition on the partition columns, then a
      local sort and one partitioned write. One network hop for the data
      (vs two filesystem passes) but pays the hash-shuffle aggregator
      machinery; ``salt=S`` splits hot partitions across S aggregators.

    Both yield the identical hive layout and per-partition (conv_id,
    turn_idx) order (asserted equal in test_router).

    ``shard_by``: ``"index"`` (default) groups files round-robin into
    ``num_shards`` fixed shards — right for a one-shot bulk job.
    ``"file"`` makes every input file its own shard KEYED BY FILE NAME, so
    a rerun after new log files arrive builds ONLY the new shards
    (incremental ingest; the committed shards' file association is stable
    under any arrival order)."""
    import ray

    from ..state.manifest import RunLock

    out_root = Path(out_dir) if out_dir else fixture_dir(sf_dir) / "routed"
    # exactly-once across CONCURRENT drivers: the loser blocks, then
    # resumes against the winner's committed manifest (state/manifest.py)
    with RunLock(out_root / ".route.lock"):
        manifest = Manifest(out_root / "MANIFEST.json")

        role_ref = tool_ref = None
        if enrich:
            role_ref = ray.put(lookups.load_map(sf_dir, "role_tenant"))
            tool_ref = ray.put(lookups.load_map(sf_dir, "tool_subsystem"))

        files = _input_files(sf_dir)
        if shard_by == "file":
            sharding = _file_shards(files)
        else:
            sharding = [
                (f"shard={i}", sf)
                for i, sf in enumerate(_shards(files, num_shards))
            ]

        for key, shard_files in sharding:
            shard_dir = out_root / key
            if manifest.is_done(key, shard_dir):
                continue
            t0 = time.monotonic()
            if shard_dir.exists():
                shutil.rmtree(shard_dir)  # idempotent rewrite, no appends

            expected_rows = None
            if exchange == "compact":
                expected_rows = _route_shard_compact(
                    shard_files, shard_dir, enrich, role_ref, tool_ref
                )
            else:
                _route_shard_hash(shard_files, shard_dir, enrich,
                                  role_ref, tool_ref, salt)

            rows, by_severity = _written_counts(shard_dir)
            if expected_rows is not None and rows != expected_rows:
                # at-least-once map retries can leave stray fragments if a
                # task died mid-write AND its retry split batches
                # differently (the deterministic content-hash fragment
                # names cover the common same-split case); fail the shard
                # BEFORE the manifest commit so the rerun wipes and
                # rebuilds it instead of double-counting
                raise RuntimeError(
                    f"routed shard {key}: compacted {rows} rows but phase "
                    f"A wrote {expected_rows}; shard left uncommitted"
                )
            manifest.commit(
                key,
                rows=rows,
                inputs=shard_files,
                wall_s=time.monotonic() - t0,
                extra={"by_severity": by_severity},
            )
        return manifest


def _parsed_enriched(shard_files: list[str], enrich: bool,
                     role_ref, tool_ref, n_cpus: int):
    import ray.data

    ds = ray.data.read_parquet(
        shard_files,
        override_num_blocks=max(n_cpus, len(shard_files)),
    )
    ds = ds.map_batches(
        parse_batch, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"groups": ROUTED_SCHEMA_GROUPS},
    )
    if enrich:
        # stateless tasks + per-worker stage cache (see stages/enrich.py):
        # same broadcast economics as an actor pool, none of its creation/
        # scheduling overhead (measured 2×), and the read→parse→enrich
        # chain stays one fused task
        ds = ds.map_batches(
            enrich_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"role_ref": role_ref, "tool_ref": tool_ref},
        )
    return ds


def _route_shard_hash(shard_files: list[str], shard_dir: Path, enrich: bool,
                      role_ref, tool_ref, salt: int | None) -> None:
    """Keyed-hash-exchange shard: every (severity, tool) combination lands
    wholly inside one output block, so the partitioned write produces ~one
    file per partition per shard instead of blocks×partitions tiny files
    (measured: 96 files vs ~9000 for 4M rows). Within each block a LOCAL
    sort restores the stable (conv_id, turn_idx) turn order per partition
    (SURVEY §2.5 O4). Skew note: one hot (severity, tool) pair hashes to
    one aggregator; ``salt=S`` adds hash(conv_id) % S to the repartition
    keys to split it — partition-dir CONTENTS are unchanged (asserted in
    test_router) because the salt never reaches the write."""
    import ray

    # NOTE: a Dataset snapshots the DataContext at creation, so the
    # hash-shuffle scope must start before read_parquet.
    with _hash_shuffle():
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        ds = _parsed_enriched(shard_files, enrich, role_ref, tool_ref, n_cpus)
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


def _route_shard_compact(shard_files: list[str], shard_dir: Path,
                         enrich: bool, role_ref, tool_ref) -> None:
    """Write-then-compact shard: phase A is the fused read→parse→enrich map
    whose tasks ALSO split their block by (severity, tool) and write hive
    fragment files (map-only; the only coordination is unique file names);
    phase B is one map task per partition directory that merges its
    fragments into a single (conv_id, turn_idx)-sorted file. No shuffle
    operator runs at all — the exchange is the storage layer, which is the
    piece a multi-node cluster scales with node count (S3/HDFS compaction
    pattern).

    Transient fragment count = map blocks × live partitions per block.
    Blocks = max(cpus, input files) (override_num_blocks), NOT row count,
    so a 1 TB shard on a 256-core cluster writes ≤ 256×partitions
    fragments — bounded, and deleted after the merge. A crashed run leaves
    ``<shard>.frags`` and no committed manifest entry; the rerun wipes and
    rebuilds both (asserted in test_router)."""
    import ray
    import ray.data

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    frag_root = shard_dir.parent / (shard_dir.name + ".frags")
    if frag_root.exists():
        shutil.rmtree(frag_root)
    frag_root.mkdir(parents=True)

    ds = _parsed_enriched(shard_files, enrich, role_ref, tool_ref, n_cpus)
    # drive phase A to completion; exact row count written. take_all() is
    # one tiny row per map block — summing on the driver skips the whole
    # distributed-aggregate stage a .sum("n") would spin up.
    written = sum(
        r["n"]
        for r in ds.map_batches(
            _write_fragments, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"frag_root": str(frag_root)},
        ).take_all()
    )

    rel_dirs = sorted(
        str(p.relative_to(frag_root))
        for p in frag_root.glob("severity=*/tool=*")
    )
    if rel_dirs:
        ray.data.from_items([{"rel": r} for r in rel_dirs]).map_batches(
            _compact_partition, batch_size=1,
            fn_kwargs={"frag_root": str(frag_root),
                       "out_root": str(shard_dir)},
        ).count()
    else:
        shard_dir.mkdir(parents=True, exist_ok=True)
    shutil.rmtree(frag_root)
    return int(written or 0)


def _write_fragments(batch: pa.Table, frag_root: str) -> pa.Table:
    """Split one parsed block by (severity, tool) and write hive fragment
    files. The batch is sorted FIRST by (conv_id, turn_idx) ONLY — the
    partition keys need no sorting because write_dataset's hive split
    preserves within-partition row order (asserted in test_router) — so
    every fragment is internally sorted and the compactor k-way-merges
    instead of re-sorting. Fragment names are a deterministic ID, not a
    uuid: Ray map tasks are at-least-once, and a task that wrote some
    fragments then died is re-executed on the same lineage block —
    deterministic names make the retry overwrite its own files instead of
    duplicating rows under fresh names. (conv_id, turn_idx) is unique
    across the dataset and blocks are disjoint row sets, so the sorted
    block's FIRST key + row count already identifies the block — an O(1)
    name (the previous full-row content hash cost ~17 ms/block)."""
    import hashlib

    import pyarrow.dataset as pads

    batch = batch.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    if batch.num_rows:
        key0 = (f"{batch['conv_id'][0].as_py()}|"
                f"{batch['turn_idx'][0].as_py()}|{batch.num_rows}")
        h = int.from_bytes(
            hashlib.blake2b(key0.encode(), digest_size=8).digest(), "big"
        )
    else:
        h = 0
    part = pads.partitioning(
        pa.schema([("severity", pa.string()), ("tool", pa.string())]),
        flavor="hive",
    )
    pads.write_dataset(
        batch, frag_root, format="parquet", partitioning=part,
        basename_template=f"frag-{int(h):016x}-{{i}}.parquet",
        existing_data_behavior="overwrite_or_ignore",
    )
    return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})


COMPACT_BUDGET_BYTES = 256 * 1024 * 1024  # in-memory compaction ceiling
MERGE_BATCH_ROWS = 256 * 1024             # k-way merge read granularity


def _compact_partition(batch, frag_root: str, out_root: str):
    """Merge one partition directory's sorted fragments into a single
    sorted file. Small partitions (≤ COMPACT_BUDGET_BYTES of parquet)
    concat-sort in memory; larger ones stream through a k-way merge whose
    footprint is bounded by fragments × MERGE_BATCH_ROWS rows, never the
    partition size — a hot (severity, tool) partition cannot OOM the
    merge task."""
    import os

    import pyarrow.parquet as pq

    budget = int(os.environ.get("PGWEASEL_COMPACT_BUDGET_BYTES",
                                COMPACT_BUDGET_BYTES))
    rels = batch["rel"] if isinstance(batch, dict) else batch["rel"].to_pylist()
    for rel in list(rels):
        src = Path(frag_root) / rel
        frags = sorted(src.glob("*.parquet"))
        dest = Path(out_root) / rel
        dest.mkdir(parents=True, exist_ok=True)
        out_file = dest / "part-0.parquet"
        if sum(f.stat().st_size for f in frags) <= budget:
            t = pa.concat_tables(pq.read_table(f) for f in frags)
            t = t.sort_by([("conv_id", "ascending"),
                           ("turn_idx", "ascending")])
            pq.write_table(t, out_file)
        else:
            _merge_sorted_fragments(frags, out_file)
    import pyarrow as _pa

    return _pa.table({"n": _pa.array([len(list(rels))], type=_pa.int64())})


def _merge_sorted_fragments(frags: list[Path], out_file: Path,
                            batch_rows: int = MERGE_BATCH_ROWS) -> None:
    """Streaming k-way merge of (conv_id, turn_idx)-sorted parquet files.

    Holds at most one ``batch_rows`` buffer per fragment plus one emit
    chunk. Loop invariant: every buffered row with key <= the minimum of
    the active buffers' LAST keys can be emitted — any future row of
    fragment i is >= its buffer's last key >= that minimum ((conv_id,
    turn_idx) is unique, so ties cannot straddle the boundary)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

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
            bc, bt = min(
                (bufs[i]["conv_id"][-1].as_py(), bufs[i]["turn_idx"][-1].as_py())
                for i in active
            )
            chunks = []
            for i in active:
                b = bufs[i]
                le = pc.or_(
                    pc.less(b["conv_id"], bc),
                    pc.and_(pc.equal(b["conv_id"], bc),
                            pc.less_equal(b["turn_idx"], bt)),
                )
                cut = int(pc.sum(le).as_py() or 0)  # sorted ⇒ prefix
                if cut:
                    chunks.append(b.slice(0, cut))
                bufs[i] = b.slice(cut)
                refill(i)
            emit = pa.concat_tables(chunks).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            writer.write_table(emit)


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

    override = os.environ.get("PGWEASEL_ROUTER_PARTS")
    if override:
        return int(override)
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
