"""corpus_export: globally-ordered training shards + manifest resume."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from pgweasel_ray import hashing as H
from pgweasel_ray.pipelines import dataprep, export
from pgweasel_ray.testing import to_df


@pytest.fixture(scope="module")
def exported(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("export") / "corpus"
    manifest = export.corpus_export(sf_dir, out)
    return sf_dir, out, manifest


def _shard_tables(out):
    tables = {}
    for k in range(export.EXPORT_SHARDS):
        f = out / f"shard={k}" / "shard.parquet"
        if f.exists() and pq.read_metadata(f).num_rows:
            tables[k] = pq.read_table(f)
    return tables


def test_export_survivors_match_corpus_prep(exported):
    sf_dir, out, _ = exported
    want = set(to_df(dataprep.corpus_prep_ds(sf_dir))["doc_id"])
    got = set()
    for t in _shard_tables(out).values():
        got.update(t["doc_id"].to_pylist())
    assert got == want


def test_export_shards_are_a_global_order(exported):
    _, out, _ = exported
    prev_hi = -1
    saw = 0
    for k in sorted(_shard_tables(out)):
        t = _shard_tables(out)[k]
        keys = np.array(t["key"].to_pylist())
        ids = np.array(t["doc_id"].to_pylist())
        # keys recompute from doc_id (the affine bijection)
        assert (keys == ((ids % H.P) * H.SHUF_A + H.SHUF_B) % H.P).all()
        # sorted within the shard, range-partitioned across shards
        assert (np.diff(keys) > 0).all()
        assert keys[0] > prev_hi
        # every key inside the shard's range bucket
        assert (export.shard_of(keys, export.EXPORT_SHARDS) == k).all()
        prev_hi = int(keys[-1])
        saw += 1
    assert saw >= 2  # the large-multiplier key spreads small ids


def test_export_manifest_counts_and_ranges(exported):
    _, out, manifest = exported
    tabs = _shard_tables(out)
    for k in range(export.EXPORT_SHARDS):
        e = manifest.entries[f"shard={k}"]
        if k in tabs:
            assert e["rows"] == tabs[k].num_rows
            assert e["key_min"] == tabs[k]["key"][0].as_py()
            assert e["key_max"] == tabs[k]["key"][-1].as_py()
        else:
            assert e["rows"] == 0


def test_export_resume_is_noop(exported):
    sf_dir, out, _ = exported
    f = next(iter(out.glob("shard=*/shard.parquet")))
    before = f.stat().st_mtime_ns
    export.corpus_export(sf_dir, out)  # fully committed → untouched
    assert f.stat().st_mtime_ns == before


def test_export_counts_veneer(exported):
    sf_dir, out, _ = exported
    df = export.corpus_export_counts(sf_dir, out)
    tabs = _shard_tables(out)
    assert dict(zip(df["shard"], df["cnt"])) == {
        k: t.num_rows for k, t in tabs.items()
    }


def test_export_crashed_run_rebuilds(exported, tmp_path):
    """An uncommitted output dir (no manifest) is wiped and rebuilt."""
    sf_dir, out, _ = exported
    out2 = tmp_path / "crashed"
    (out2 / "shard=0").mkdir(parents=True)
    (out2 / "shard=0" / "shard.parquet").write_bytes(b"garbage")
    m = export.corpus_export(sf_dir, out2)
    assert m.total_rows() == sum(
        t.num_rows for t in _shard_tables(out).values()
    )
    got = pq.read_table(out2 / "shard=0" / "shard.parquet")
    want = pq.read_table(out / "shard=0" / "shard.parquet")
    assert got.equals(want)
