"""Ray-vs-DuckDB parity for the ExactSubstr family on RANDOM corpora with
PLANTED duplicate spans (any alignment, partial overlaps, sub-threshold
decoys) — the failure modes a fixture can't enumerate. The oracle SQL is
the driver's own (shingle-string CTE), re-bound to the random table."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgweasel_ray.pipelines import dataprep
from pgweasel_ray.pipelines.dataprep import EXSUB_L
from pgweasel_ray.testing import compare, to_df


def _random_span_corpus(seed: int, n_docs: int = 40) -> pa.Table:
    rng = np.random.default_rng(seed)

    def words(n):
        return [f"t{int(rng.integers(0, 400))}" for _ in range(n)]

    docs = [words(int(rng.integers(5, 120))) for _ in range(n_docs)]
    # planted spans: full-threshold (>= L tokens, any alignment)...
    for _ in range(6):
        a, b = rng.integers(0, n_docs, 2)
        if len(docs[a]) < EXSUB_L + 4:
            docs[a] = docs[a] + words(EXSUB_L + 4 - len(docs[a]))
        start = int(rng.integers(0, len(docs[a]) - EXSUB_L))
        span = docs[a][start:start + EXSUB_L + int(rng.integers(0, 9))]
        ins = int(rng.integers(0, len(docs[b]) + 1))
        docs[b] = docs[b][:ins] + span + docs[b][ins:]
    # ...and sub-threshold decoys (L-1 tokens — must NOT flag)
    for _ in range(4):
        a, b = rng.integers(0, n_docs, 2)
        if len(docs[a]) >= EXSUB_L - 1:
            decoy = docs[a][:EXSUB_L - 1]
            docs[b] = decoy + docs[b]
    texts = [" ".join(d) for d in docs]
    return pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n_docs),
        "source": pa.array(["r"] * n_docs),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })


@pytest.fixture(scope="module", params=[101, 2025])
def span_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"rspan{request.param}")
    pq.write_table(_random_span_corpus(request.param),
                   d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def oracles():
    from pgweasel_ray.oracle_queries import build_oracles

    return build_oracles("/root/testdata/sf0.001")


@pytest.mark.parametrize(
    "name", ["dedup_exact_substr", "docs_dup_span_strip", "docs_novelty"])
def test_exsub_query_matches_oracle_on_random_spans(span_dir, oracles, name):
    got = to_df(getattr(dataprep, name)(span_dir))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{span_dir}/documents.parquet')")
    want = con.sql(oracles[name]).df()
    verdict = compare(got, want)
    assert verdict == "OK", f"{name}: {verdict}"
