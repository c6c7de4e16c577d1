"""Ray-vs-DuckDB parity on RANDOM corpora (not just the driver fixture):
seeded generators produce documents tables with planted duplicate/near-dup
structure, and every deterministic dataprep operator must match its oracle
SQL on them — distribution-independent correctness evidence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgweasel_ray.pipelines import dataprep
from pgweasel_ray.testing import to_df

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu the and of to in is"
).split()


def _random_corpus(seed: int, n_docs: int = 60) -> list[str]:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n_docs):
        n_words = int(rng.integers(0, 40))
        words = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n_words)]
        texts.append(" ".join(words))
    # plant exact dups and near dups
    for _ in range(6):
        a, b = rng.integers(0, n_docs, 2)
        texts[b] = texts[a]
    for _ in range(6):
        a, b = rng.integers(0, n_docs, 2)
        words = texts[a].split()
        if len(words) > 5:
            words[int(rng.integers(0, len(words)))] = "mutated"
            texts[b] = " ".join(words)
    return texts


@pytest.fixture(scope="module", params=[11, 22, 33])
def random_dir(request, tmp_path_factory):
    texts = _random_corpus(request.param)
    d = tmp_path_factory.mktemp(f"rand{request.param}")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["r"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(random_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{random_dir}/documents.parquet')"
    )
    return con


def _assert_matches_oracle(random_dir, oracle_con, name, fn):
    from pgweasel_ray import oracle_queries

    summary = oracle_queries._survivor_summary_sql  # gate shape (r5)
    sql = {
        "dedup_minhash":
            lambda: summary(oracle_queries._dedup_minhash_sql(), "doc_id"),
        "dedup_ngram_jaccard":
            lambda: summary(oracle_queries._dedup_jaccard_sql(), "doc_id"),
        "dedup_simhash":
            lambda: summary(oracle_queries._dedup_simhash_sql(), "doc_id"),
        "docs_lang_id": oracle_queries._lang_id_sql,
        "docs_vocab_topk": oracle_queries._vocab_topk_sql,
        "docs_decontaminate": oracle_queries._decontaminate_sql,
        "docs_repetition": oracle_queries._repetition_sql,
        "docs_sample_hash": oracle_queries._sample_hash_sql,
        "corpus_prep":
            lambda: summary(oracle_queries._corpus_prep_sql(), "doc_id"),
        "docs_length_quantiles": oracle_queries._length_quantiles_sql,
        "docs_normalize": oracle_queries._normalize_sql,
        "dedup_chunks": oracle_queries._dedup_chunks_sql,
        "docs_shuffle_order": oracle_queries._shuffle_order_sql,
        "docs_pack_sequences": oracle_queries._pack_sequences_sql,
        "docs_lm_surprisal": oracle_queries._lm_surprisal_sql,
        "docs_bigram_surprisal": oracle_queries._bigram_surprisal_sql,
        "docs_char_entropy": oracle_queries._char_entropy_sql,
        "docs_pmi_topk": oracle_queries._pmi_topk_sql,
        "docs_kmv_distinct": oracle_queries._kmv_distinct_sql,
    }[name]()
    ray_df = to_df(fn(random_dir))
    ora_df = oracle_con.sql(sql).df()
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = ora_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize(
    "name,fn",
    [
        ("dedup_minhash", dataprep.dedup_minhash),
        ("dedup_ngram_jaccard", dataprep.dedup_ngram_jaccard),
        ("dedup_simhash", dataprep.dedup_simhash),
        ("docs_lang_id", dataprep.docs_lang_id),
        ("docs_vocab_topk", dataprep.docs_vocab_topk),
        ("docs_decontaminate", dataprep.docs_decontaminate),
        ("docs_repetition", dataprep.docs_repetition),
        ("docs_sample_hash", dataprep.docs_sample_hash),
        ("corpus_prep", dataprep.corpus_prep),
        ("docs_length_quantiles", dataprep.docs_length_quantiles),
        ("docs_normalize", dataprep.docs_normalize),
        ("dedup_chunks", dataprep.dedup_chunks),
        ("docs_shuffle_order", dataprep.docs_shuffle_order),
        ("docs_pack_sequences", dataprep.docs_pack_sequences),
        ("docs_lm_surprisal", dataprep.docs_lm_surprisal),
        ("docs_bigram_surprisal", dataprep.docs_bigram_surprisal),
        ("docs_char_entropy", dataprep.docs_char_entropy),
        ("docs_pmi_topk", dataprep.docs_pmi_topk),
        ("docs_kmv_distinct", dataprep.docs_kmv_distinct),
    ],
)
def test_random_corpus_matches_oracle(random_dir, oracle_con, name, fn):
    _assert_matches_oracle(random_dir, oracle_con, name, fn)


def test_random_fingerprint_matches_oracle(random_dir, oracle_con):
    from pgweasel_ray import hashing as H

    ray_df = to_df(dataprep.docs_fingerprint(random_dir)).set_index("doc_id")
    ora = dict(oracle_con.sql(H.sql_fingerprint_select()).fetchall())
    for doc_id, want in ora.items():
        assert ray_df.loc[doc_id, "fingerprint"] == want
