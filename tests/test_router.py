"""Router + manifest: partitioned sink layout, lineage, idempotent resume."""

from __future__ import annotations

import json
import shutil
import time

import pytest

from pgweasel_ray.pipelines import router
from pgweasel_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def routed(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("routed")
    manifest = router.route(sf_dir, out_dir=out, num_shards=4)
    return sf_dir, out, manifest


def test_layout_and_counts(routed, sf_dir):
    _, out, manifest = routed
    shards = sorted(p.name for p in out.glob("shard=*"))
    assert shards == ["shard=0", "shard=1", "shard=2", "shard=3"]
    # severity=<v>/tool=<v> nested hive partitions
    sev_dirs = {p.name for p in (out / "shard=0").glob("severity=*")}
    assert "severity=error" in sev_dirs and "severity=log" in sev_dirs
    tool_dirs = {p.name for s in sev_dirs
                 for p in (out / "shard=0" / s).glob("tool=*")}
    assert any(d.startswith("tool=") for d in tool_dirs)
    # total routed rows == input rows
    import pyarrow.parquet as pq

    from pgweasel_ray.sources.transcripts import transcripts_path

    expected = sum(
        pq.read_metadata(f).num_rows
        for f in transcripts_path(sf_dir).glob("*.parquet")
    )
    assert manifest.total_rows() == expected


def test_manifest_lineage(routed):
    _, out, manifest = routed
    entries = json.loads((out / "MANIFEST.json").read_text())
    assert set(entries) == {f"shard={i}" for i in range(4)}
    for e in entries.values():
        assert e["status"] == "done"
        assert e["rows"] > 0
        assert e["inputs"]  # input-file lineage recorded
        assert "by_severity" in e and e["by_severity"]
        assert sum(e["by_severity"].values()) == e["rows"]


def test_resume_skips_done_shards(routed, sf_dir):
    _, out, _ = routed
    t0 = time.monotonic()
    m2 = router.route(sf_dir, out_dir=out, num_shards=4)
    assert time.monotonic() - t0 < 1.0  # no Ray job launched: pure skip
    assert m2.total_rows() == Manifest(out / "MANIFEST.json").total_rows()


def test_resume_rewrites_missing_shard(routed, sf_dir):
    _, out, before = routed
    total_before = before.total_rows()
    shutil.rmtree(out / "shard=1")
    m = router.route(sf_dir, out_dir=out, num_shards=4)
    assert (out / "shard=1").exists()
    assert m.total_rows() == total_before  # no duplication, no loss


def test_exchange_modes_same_partition_contents(routed, sf_dir, tmp_path):
    """All exchange modes (compact [the routed fixture's default], hash,
    hash+salt) must only change HOW rows travel — every hive partition dir
    holds the identical row set, and within-conversation turn order is
    intact."""
    import duckdb

    _, out_compact, _ = routed  # default exchange="compact"
    out_hash = tmp_path / "hash"
    router.route(sf_dir, out_dir=out_hash, num_shards=4, exchange="hash")
    out_salted = tmp_path / "salted"
    router.route(sf_dir, out_dir=out_salted, num_shards=4, exchange="hash",
                 salt=4)

    q = ("SELECT severity, tool, conv_id, turn_idx, text "
         "FROM read_parquet('{}/shard=*/severity=*/tool=*/*.parquet', "
         "hive_partitioning=1)")
    key = ["severity", "tool", "conv_id", "turn_idx"]
    compact = duckdb.sql(q.format(out_compact)).df().sort_values(key).reset_index(drop=True)
    hashed = duckdb.sql(q.format(out_hash)).df().sort_values(key).reset_index(drop=True)
    salted = duckdb.sql(q.format(out_salted)).df().sort_values(key).reset_index(drop=True)
    assert compact.equals(hashed)
    assert compact.equals(salted)
    # no _salt column may leak into the written files
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{out_salted}/shard=0/severity=*/tool=*/*.parquet') LIMIT 0"
    ).df().columns
    assert "_salt" not in cols
    # per-partition (conv_id, turn_idx) order inside the compact files
    one = sorted((out_compact / "shard=0").glob("severity=*/tool=*/*.parquet"))[0]
    df = duckdb.sql(f"SELECT conv_id, turn_idx FROM read_parquet('{one}')").df()
    assert df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
        df.reset_index(drop=True)
    )


def test_crashed_compact_run_resumes_clean(routed, sf_dir, tmp_path):
    """A run that died mid-compaction leaves a stale .frags dir and an
    uncommitted shard; the rerun must wipe both and produce the exact
    committed state of a clean run."""
    out = tmp_path / "crashed"
    # simulate the crash artifacts of shard 0
    frags = out / "shard=0.frags" / "severity=error" / "tool=bash"
    frags.mkdir(parents=True)
    (frags / "frag-dead.parquet").write_bytes(b"not a parquet file")
    (out / "shard=0" / "severity=error").mkdir(parents=True)

    m = router.route(sf_dir, out_dir=out, num_shards=2)
    assert not (out / "shard=0.frags").exists()
    _, out_ref, ref_manifest = routed
    assert m.total_rows() == ref_manifest.total_rows()


def test_route_real_dir_and_incremental_by_file(sf_dir, tmp_path):
    """(a) A REAL transcripts parquet dir routes its own bytes (not the
    name-keyed synthetic fixture); (b) shard_by='file' is incremental: a
    new file arriving later builds ONLY its own shard."""
    import shutil as sh

    import pyarrow.parquet as pq

    from pgweasel_ray.sources.transcripts import transcripts_path

    src = sorted(transcripts_path(sf_dir).glob("*.parquet"))
    assert len(src) >= 3
    inp = tmp_path / "incoming"
    inp.mkdir()
    for f in src[:2]:
        sh.copy(f, inp / f.name)

    out = tmp_path / "routed"
    m1 = router.route(str(inp), out_dir=out, shard_by="file")
    keys1 = set(m1.entries)
    assert keys1 == {f"shard={f.stem}" for f in src[:2]}
    rows_first_two = sum(pq.read_metadata(f).num_rows for f in src[:2])
    assert m1.total_rows() == rows_first_two  # real bytes, not a fixture

    done_mtime = {
        k: (out / k).stat().st_mtime_ns for k in keys1
    }
    sh.copy(src[2], inp / src[2].name)  # a new log file arrives
    m2 = router.route(str(inp), out_dir=out, shard_by="file")
    assert set(m2.entries) == keys1 | {f"shard={src[2].stem}"}
    # only the new shard was built; committed shards untouched
    for k in keys1:
        assert (out / k).stat().st_mtime_ns == done_mtime[k]
    assert m2.total_rows() == rows_first_two + pq.read_metadata(src[2]).num_rows


def test_merge_sorted_fragments_streaming(tmp_path):
    """The k-way merge must produce the exact sorted union with a read
    granularity far below the fragment sizes (streams several buffers per
    fragment) — the bounded-memory compaction path for hot partitions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    frags = []
    all_keys = []
    for i in range(3):
        n = 1000 + i * 137
        conv = np.array([f"c{v:06d}" for v in rng.integers(0, 500, n)])
        turn = rng.integers(0, 10_000, n).astype(np.int32)
        t = pa.table({"conv_id": conv, "turn_idx": turn,
                      "payload": rng.integers(0, 1 << 30, n)})
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        all_keys.append(t)
    # (conv_id, turn_idx) is a primary key in routed data: drop duplicates
    seen: set = set()
    uniq_tables = []
    for i, t in enumerate(all_keys):
        mask = []
        for c, x in zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()):
            mask.append((c, x) not in seen)
            seen.add((c, x))
        t2 = t.filter(pa.array(mask))
        f = tmp_path / f"frag-{i}.parquet"
        pq.write_table(t2, f)
        frags.append(f)
        uniq_tables.append(t2)
    out = tmp_path / "merged.parquet"
    router._merge_sorted_fragments(frags, out, batch_rows=100)
    got = pq.read_table(out)
    want = pa.concat_tables(uniq_tables).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert got.equals(want)
    assert pq.ParquetFile(out).metadata.num_row_groups > 1  # streamed


def test_compact_streaming_budget_matches_default(sf_dir, tmp_path, monkeypatch):
    """Routing with a 1-byte compaction budget (every partition takes the
    streaming k-way merge) must yield the identical partition contents and
    within-partition order as the in-memory path."""
    import duckdb

    out_stream = tmp_path / "stream"
    monkeypatch.setenv("PGWEASEL_COMPACT_BUDGET_BYTES", "1")
    router.route(sf_dir, out_dir=out_stream, num_shards=2)
    monkeypatch.delenv("PGWEASEL_COMPACT_BUDGET_BYTES")
    out_mem = tmp_path / "mem"
    router.route(sf_dir, out_dir=out_mem, num_shards=2)

    q = ("SELECT severity, tool, conv_id, turn_idx, text "
         "FROM read_parquet('{}/shard=*/severity=*/tool=*/*.parquet', "
         "hive_partitioning=1) ORDER BY severity, tool, conv_id, turn_idx")
    a = duckdb.sql(q.format(out_stream)).df()
    b = duckdb.sql(q.format(out_mem)).df()
    assert a.equals(b)
    # within-file order is sorted on the streaming path too
    one = sorted(out_stream.glob("shard=0/severity=*/tool=*/*.parquet"))[0]
    df = duckdb.sql(
        f"SELECT conv_id, turn_idx FROM read_parquet('{one}')"
    ).df()
    assert df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
        df.reset_index(drop=True)
    )


def test_fragment_names_deterministic(sf_dir, tmp_path):
    """Fragment file names derive from batch CONTENT (retry-idempotent): two
    identical phase-A runs over the same shard produce the identical
    fragment name set, so an at-least-once re-execution overwrites rather
    than duplicates."""
    import pyarrow.parquet as pq

    from pgweasel_ray.sources.transcripts import transcripts_path

    f = sorted(transcripts_path(sf_dir).glob("*.parquet"))[0]
    t = pq.read_table(f)
    names = []
    for _ in range(2):
        frag_root = tmp_path / "frags"
        if frag_root.exists():
            shutil.rmtree(frag_root)
        frag_root.mkdir()
        from pgweasel_ray.stages.parse import parse_batch

        parsed = parse_batch(t, groups=router.ROUTED_SCHEMA_GROUPS)
        router._write_fragments(parsed, str(frag_root))
        names.append(sorted(p.name for p in frag_root.rglob("*.parquet")))
    assert names[0] == names[1]
    # and a second write into the SAME dir does not duplicate files
    parsed = parse_batch(t, groups=router.ROUTED_SCHEMA_GROUPS)
    router._write_fragments(parsed, str(tmp_path / "frags"))
    assert sorted(
        p.name for p in (tmp_path / "frags").rglob("*.parquet")
    ) == names[1]


def test_routed_readback_row_texts(routed, sf_dir):
    """Set equality of routed rows vs input — the routed-row invariant."""
    _, out, _ = routed
    import duckdb

    from pgweasel_ray.sources.transcripts import transcripts_glob

    got = duckdb.sql(
        f"SELECT conv_id, turn_idx, text FROM read_parquet('{out}/shard=*/severity=*/tool=*/*.parquet')"
    ).df()
    want = duckdb.sql(
        f"SELECT conv_id, turn_idx, text FROM read_parquet('{transcripts_glob(sf_dir)}')"
    ).df()
    key = ["conv_id", "turn_idx", "text"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert got_s.equals(want_s)


def test_concurrent_routes_commit_exactly_once(sf_dir, tmp_path):
    """Two drivers resuming the same out_dir: the RunLock serializes them;
    the loser resumes against the winner's committed manifest — one
    manifest, no duplicated shard rows (round-4 exactly-once item)."""
    import threading

    from pgweasel_ray.pipelines import router

    out = str(tmp_path / "concurrent")
    results, errors = [], []

    def run():
        try:
            results.append(router.route(sf_dir, out_dir=out, num_shards=2))
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(results) == 2
    # both callers see the same complete manifest
    assert results[0].total_rows() == results[1].total_rows()
    import duckdb

    rows = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/shard=*/**/*.parquet', "
        "hive_partitioning=true)"
    ).fetchone()[0]
    assert rows == results[0].total_rows()
    # lock released
    assert not (tmp_path / "concurrent" / ".route.lock").exists()


def test_stale_lock_from_dead_driver_is_stolen(sf_dir, tmp_path):
    import subprocess
    import sys

    from pgweasel_ray.pipelines import router

    out = tmp_path / "stale"
    out.mkdir()
    dead = subprocess.run([sys.executable, "-c", "import os; print(os.getpid())"],
                          capture_output=True, text=True)
    (out / ".route.lock").write_text(dead.stdout.strip())
    m = router.route(sf_dir, out_dir=str(out), num_shards=2)
    assert m.total_rows() > 0
    assert not (out / ".route.lock").exists()


def test_live_lock_blocks_then_times_out(tmp_path):
    import os

    from pgweasel_ray.state.manifest import RunLock

    lock = tmp_path / ".route.lock"
    lock.write_text(str(os.getpid()))  # held by a live pid (us)
    import pytest

    with pytest.raises(TimeoutError):
        RunLock(lock).acquire(timeout_s=0.5)
