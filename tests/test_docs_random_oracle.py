"""Ray-vs-DuckDB parity for the remaining docs/sketch/corpus-construction
queries on RANDOM corpora (multi-source, multi-line, planted exact dups and
shared boilerplate lines) — extends test_dataprep_random_oracle to the
families it doesn't touch. Oracle SQL is the driver's own, re-bound to the
random table (all are documents-view-only; verified by grep)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgweasel_ray.pipelines import dataprep
from pgweasel_ray.testing import compare, to_df

SOURCES = ["web", "books", "code", "forums"]


def _random_docs(seed: int, n_docs: int = 80) -> pa.Table:
    rng = np.random.default_rng(seed)

    def line():
        return " ".join(f"w{int(rng.integers(0, 300))}"
                        for _ in range(int(rng.integers(5, 20))))

    boiler = [line() for _ in range(4)]     # shared boilerplate lines
    # real-ish alpha vocabulary incl. stopwords so the Gopher/quality
    # filters have passers (all-"w12"-style corpora empty both filters —
    # and an all-filtered sorted Dataset has NO schema to compare)
    vocab = ("the and of to a in is it alpha bravo charlie delta echo "
             "foxtrot golf hotel india juliet kilo lima mike november "
             "oscar papa quebec romeo sierra tango uniform victor").split()
    texts = []
    for i in range(n_docs):
        if i % 4 == 0:                      # quality docs: long, alpha-only
            n = int(rng.integers(60, 130))
            texts.append(" ".join(vocab[int(rng.integers(0, len(vocab)))]
                                  for _ in range(n)))
            continue
        lines = [line() for _ in range(int(rng.integers(1, 6)))]
        if rng.random() < 0.4:              # plant boilerplate
            lines.insert(int(rng.integers(0, len(lines))),
                         boiler[int(rng.integers(0, len(boiler)))])
        texts.append("\n".join(lines))
    for _ in range(6):                       # planted exact duplicates
        a, b = rng.integers(0, n_docs, 2)
        texts[b] = texts[a]
    return pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([["en", "de", "fr"][int(rng.integers(0, 3))]
                          for _ in range(n_docs)]),
        "source": pa.array([SOURCES[int(rng.integers(0, len(SOURCES)))]
                            for _ in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })


@pytest.fixture(scope="module", params=[61, 3001])
def docs_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"rdocs{request.param}")
    pq.write_table(_random_docs(request.param), d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def oracles():
    from pgweasel_ray.oracle_queries import build_oracles

    return build_oracles("/root/testdata/sf0.001")


QUERIES = [
    "docs_token_stats", "docs_bpe_tokens", "docs_quality",
    "docs_quality_filter", "docs_scrub", "docs_gopher_filter",
    "docs_tfidf_topk", "docs_distinct_hll", "docs_source_distinct_hll",
    "docs_source_stats", "docs_topk_per_source", "docs_heavy_hitters_cms",
    "docs_stratified_sample", "docs_weighted_sample", "docs_mixture_sample",
    "docs_select_budget", "docs_inverted_postings",
    "docs_decontaminate_bloom", "docs_contamination_overlap",
    "docs_line_dedup", "docs_strip_boilerplate", "dedup_exact",
    "dedup_components", "dedup_cluster_best", "docs_minhash_sim_topk",
    "docs_winnowing", "docs_winnow_sim_topk", "docs_fingerprint",
    "docs_chunk_overlap", "docs_type_token_stats",
]


@pytest.mark.parametrize("name", QUERIES)
def test_docs_query_matches_oracle_on_random_corpus(docs_dir, oracles, name):
    got = to_df(getattr(dataprep, name)(docs_dir))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{docs_dir}/documents.parquet')")
    want = con.sql(oracles[name]).df()
    verdict = compare(got, want)
    assert verdict == "OK", f"{name}: {verdict}"
