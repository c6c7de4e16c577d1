"""Ray-vs-DuckDB parity for the embeddings family on RANDOM vector tables
(clustered gaussians + planted near-duplicates, not the driver fixture).
Seed/dim-bound oracles (cosine, LSH, label centroids, neardup) re-bind to
the random table as-is; data-bound oracles (IVF, full-loop k-means) are
rebuilt from the random directory with the same builders the driver path
uses — distribution-independent parity evidence."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgweasel_ray import oracle_queries as oq
from pgweasel_ray.pipelines import dataprep
from pgweasel_ray.testing import compare, to_df

DIM = 64  # matches the fixture dim the static (seed-bound) oracles embed


def _random_embeddings(seed: int, n: int = 300) -> pa.Table:
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(10, DIM))
    labels = rng.integers(0, 10, n)
    mat = centers[labels] + 0.15 * rng.normal(size=(n, DIM))
    # planted near-duplicates (embed_neardup's quarry)
    for _ in range(8):
        a, b = rng.integers(0, n, 2)
        mat[b] = mat[a] + 1e-4 * rng.normal(size=DIM)
    # unit-normalize rows: embedding components live in [-1, 1] — the
    # domain the KM_SHIFT fixed-point contract requires (guarded in
    # _km_quantize) and what real embedding columns look like
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat.astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })


@pytest.fixture(scope="module", params=[31, 404])
def embed_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"remb{request.param}")
    pq.write_table(_random_embeddings(request.param),
                   d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def static_oracles():
    # these SQLs depend only on seeds + DIM, never on the data
    return oq.build_oracles("/root/testdata/sf0.001")


STATIC = ["ann_cosine_topk", "ann_lsh_topk", "embed_label_centroids",
          "embed_neardup", "embed_label_outliers"]
BOUND = {"ann_ivf_topk": lambda d: oq._ann_ivf_sql(d),
         "embed_kmeans_centroids": lambda d: oq._kmeans_sql(d),
         "embed_kcenter_coreset": lambda d: oq._kcenter_sql(d)}


def _run(embed_dir, name, sql):
    fn = getattr(dataprep, name)
    got = to_df(fn(embed_dir))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{embed_dir}/embeddings.parquet')")
    want = con.sql(sql).df()
    verdict = compare(got, want)
    assert verdict == "OK", f"{name}: {verdict}"


@pytest.mark.parametrize("name", STATIC)
def test_static_embed_query_matches_oracle(embed_dir, static_oracles, name):
    _run(embed_dir, name, static_oracles[name])


@pytest.mark.parametrize("name", sorted(BOUND))
def test_data_bound_embed_query_matches_oracle(embed_dir, name):
    _run(embed_dir, name, BOUND[name](embed_dir))
