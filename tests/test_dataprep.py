"""Training-data ops: dedup (exact / MinHash / SimHash), similarity search,
text analysis — semantic assertions on crafted corpora (the rows-only ops
that have no SQL oracle get their real checks here)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgweasel_ray.pipelines import dataprep
from pgweasel_ray.testing import to_df

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    """A documents.parquet with known duplicate structure:
    0/1 exact dups; 2 near-dup of 0 (one word changed); 3/4 unrelated."""
    d = tmp_path_factory.mktemp("crafted")
    texts = [
        BASE,
        BASE,  # exact dup of 0
        BASE.replace("lazy", "sleepy"),  # near dup of 0
        "completely different content about distributed query engines and "
        "arrow columnar formats with zero overlap in shingles whatsoever "
        "because every word here is from another vocabulary entirely",
        "ein kurzer deutscher text der die sprache erkennung testen soll "
        "und nicht mit den anderen texten verwechselt werden kann",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en", "en", "en", "en", "de"]),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_dedup_exact_crafted(crafted_dir):
    got = sorted(to_df(dataprep.dedup_exact(crafted_dir))["doc_id"])
    assert got == [0, 2, 3, 4]  # doc 1 (exact dup of 0) removed


def test_dedup_minhash_removes_near_dups(crafted_dir):
    got = sorted(to_df(dataprep.dedup_minhash_ds(crafted_dir))["doc_id"])
    assert 0 in got and 3 in got and 4 in got
    assert 1 not in got  # exact dup always caught
    assert 2 not in got  # one-word change shares most shingles → LSH-caught


def test_dedup_components_crafted(crafted_dir):
    df = to_df(dataprep.dedup_components(crafted_dir))
    comp = dict(zip(df["doc_id"], df["component_id"]))
    assert len(comp) == 5  # every doc gets a component, singletons included
    assert comp[0] == comp[1] == comp[2] == 0  # exact+near dups cluster to min id
    assert comp[3] == 3 and comp[4] == 4  # unrelated docs stay singletons
    # every component label is the min doc_id of its members
    for cid, grp in df.groupby("component_id"):
        assert cid == grp["doc_id"].min()


def test_dedup_components_transitive_chain(tmp_path):
    """A~B and B~C must land in ONE component even if A,C never share a
    bucket — the transitive closure survivor-dedup can't express."""
    texts = [
        BASE,
        BASE.replace("lazy", "sleepy"),
        BASE.replace("lazy", "sleepy").replace("cat", "kitten"),
        "totally unrelated filler words about databases and compilers "
        "spanning an entirely disjoint vocabulary for isolation purposes",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    df = to_df(dataprep.dedup_components(str(tmp_path)))
    comp = dict(zip(df["doc_id"], df["component_id"]))
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == 3


def test_dedup_components_distributed_path_matches_local(
        crafted_dir, monkeypatch):
    """Force the iterative distributed propagation (edge cap 0) and assert
    it produces exactly the local scatter-min result."""
    local = to_df(dataprep.dedup_components(crafted_dir))
    monkeypatch.setattr(dataprep, "COMPONENTS_LOCAL_MAX_EDGES", 0)
    dist = to_df(dataprep.dedup_components(crafted_dir))
    pd.testing.assert_frame_equal(local, dist)


def test_dedup_cluster_best_keeps_longest(tmp_path):
    """Representative selection: the LONGEST member of a near-dup cluster
    survives (truncated copy loses), ties break to min doc_id."""
    texts = [
        BASE + " with a few extra closing words appended",  # longest copy
        BASE,
        BASE,  # exact dup of 1 — same length, must lose the id tie-break
        "entirely separate subject matter concerning compilers and type "
        "systems with no shingle overlap against the animal sentences",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    df = to_df(dataprep.dedup_cluster_best(str(tmp_path)))
    by_comp = df.set_index("component_id")
    assert by_comp.loc[0, "doc_id"] == 0  # longest member represents cluster
    assert by_comp.loc[0, "n_members"] == 3
    assert by_comp.loc[3, "doc_id"] == 3 and by_comp.loc[3, "n_members"] == 1


def test_dedup_ngram_jaccard_verified(crafted_dir):
    got = sorted(to_df(dataprep.dedup_ngram_jaccard_ds(crafted_dir))["doc_id"])
    assert got == [0, 3, 4]  # 1 exact dup (J=1), 2 one-word change (J≥0.7)


def test_dedup_simhash_removes_near_dups(crafted_dir):
    got = sorted(to_df(dataprep.dedup_simhash_ds(crafted_dir))["doc_id"])
    assert 1 not in got and 2 not in got
    assert 0 in got and 3 in got and 4 in got


def test_lang_id_crafted(crafted_dir):
    got = to_df(dataprep.docs_lang_id(crafted_dir)).set_index("doc_id")
    assert got.loc[0, "lang_pred"] == "en"
    assert got.loc[4, "lang_pred"] == "de"


def test_fingerprint_deterministic_and_dup_sensitive(crafted_dir):
    got = to_df(dataprep.docs_fingerprint(crafted_dir)).set_index("doc_id")
    # identical texts → identical fingerprints; distinct texts → distinct
    assert got.loc[0, "fingerprint"] == got.loc[1, "fingerprint"]
    assert got.loc[0, "fingerprint"] != got.loc[3, "fingerprint"]
    # deterministic across invocations
    again = to_df(dataprep.docs_fingerprint(crafted_dir)).set_index("doc_id")
    assert got["fingerprint"].to_dict() == again["fingerprint"].to_dict()


def test_ann_bruteforce_matches_numpy(sf_dir):
    got = list(to_df(dataprep.ann_cosine_topk(sf_dir))["vec_id"])
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    q = mat[list(t["vec_id"].to_pylist()).index(0)]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        zip(t["vec_id"].to_pylist(), sims), key=lambda x: (-x[1], x[0])
    )
    want = [v for v, _ in order[:10]]
    assert got == want
    assert got[0] == 0  # the query vector itself, cosine 1.0


def test_ann_lsh_subset_and_self_hit(sf_dir):
    lsh = list(dataprep.ann_lsh_topk(sf_dir)["vec_id"])
    assert lsh[0] == 0  # query's own bucket always contains the query
    # results must be exactly the top of the query's LSH bucket by exact
    # cosine (the approximation prunes by bucket, never reorders)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    ids = np.array(t["vec_id"].to_pylist())
    q = mat[list(ids).index(0)]
    stage = dataprep.LshBucketStage(dim=mat.shape[1])
    buckets = stage.signature(mat)
    q_bucket = int(stage.signature(q[None, :])[0])
    member_mask = buckets == q_bucket
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    members = sorted(
        zip(ids[member_mask], sims[member_mask]), key=lambda x: (-x[1], x[0])
    )
    want = [int(v) for v, _ in members[:10]]
    assert lsh == want


def test_ann_ivf_full_probe_equals_bruteforce(sf_dir):
    """nprobe == nlist must degenerate to EXACT brute-force top-k."""
    exact = list(to_df(dataprep.ann_cosine_topk(sf_dir))["vec_id"])
    ivf_full = list(dataprep.ann_ivf_topk(sf_dir, nlist=16, nprobe=16)["vec_id"])
    assert ivf_full == exact


def test_ann_ivf_partial_probe_sane(sf_dir):
    got = list(dataprep.ann_ivf_topk(sf_dir, nlist=16, nprobe=4)["vec_id"])
    assert got[0] == 0  # the query vector's own list is always probed first
    exact = list(to_df(dataprep.ann_cosine_topk(sf_dir))["vec_id"])
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.2  # random vectors scatter; sanity bound only


def test_embed_neardup_keeps_all_when_no_dups(sf_dir):
    got = to_df(dataprep.embed_neardup_ds(sf_dir))
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    assert len(got) == t.num_rows  # random embeddings: no cosine > 0.999


def test_embed_neardup_crafted(tmp_path):
    rng = np.random.default_rng(5)
    base = rng.standard_normal(64).astype(np.float32)
    rows = [
        (0, base),
        (1, base * np.float32(2.0)),           # same direction → cosine 1
        (2, rng.standard_normal(64).astype(np.float32)),
    ]
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "embedding": pa.array([r[1].tolist() for r in rows],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0], type=pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = sorted(to_df(dataprep.embed_neardup_ds(str(tmp_path)))["vec_id"])
    assert got == [0, 2]  # 1 is a scaled copy of 0 → removed


def test_embed_neardup_hot_bucket_chunked(tmp_path, monkeypatch):
    """A deliberately HOT bucket (120 near-identical vectors + noise) with
    the in-bucket matmul budget shrunk so the chunked path runs many
    chunks; result must equal an independent numpy replay of the blocking
    semantics (same buckets, exact cosine, smaller-id domination)."""
    from pgweasel_ray import hashing as H

    rng = np.random.default_rng(9)
    dim = 32
    base = rng.standard_normal(dim)
    vecs = [base + rng.standard_normal(dim) * 1e-6 for _ in range(120)]
    vecs += [rng.standard_normal(dim) for _ in range(30)]
    mat = np.stack(vecs).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), type=pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    monkeypatch.setattr(dataprep, "EMB_ND_CHUNK_BUDGET", 64)  # force chunks
    got = sorted(to_df(dataprep.embed_neardup_ds(str(tmp_path)))["vec_id"])

    # independent replay: ND-plane buckets + all-pairs cosine
    m64 = mat.astype(np.float64)
    buckets = dataprep.LshBucketStage(
        dim, H.EMB_ND_PLANES, H.EMB_ND_SEED
    ).signature(m64)
    norm = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    sims = norm @ norm.T
    thr = dataprep.EMBED_NEARDUP_THRESHOLD
    dominated = {
        j for j in range(len(vecs)) for i in range(j)
        if buckets[i] == buckets[j] and sims[i, j] > thr
    }
    want = sorted(set(range(len(vecs))) - dominated)
    assert got == want
    assert len(dominated) >= 100  # the hot bucket really was hot


def test_semdedup_matches_local_replay(sf_dir):
    """SemDeDup vs an independent numpy replay: same seeded k-means
    centroids, argmax cluster assignment, in-cluster all-pairs cosine with
    smaller-id domination. Unlike embed_neardup (threshold far above the
    fixture's similarity range), the SemDeDup threshold sits INSIDE it, so
    this exercises a non-empty dominated set end-to-end."""
    got = sorted(to_df(dataprep.docs_semdedup_ds(sf_dir))["vec_id"])

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.asarray(
        t["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(t.num_rows, -1)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cents = dataprep._train_centroids(sf_dir, dataprep.SEMDEDUP_NLIST)
    asg = dataprep._det_mm(mn, cents.T).argmax(axis=1)
    order = np.argsort(ids)
    ids, mn, asg = ids[order], mn[order], asg[order]
    dominated = set()
    for c in range(dataprep.SEMDEDUP_NLIST):
        idx = np.flatnonzero(asg == c)
        sims = mn[idx] @ mn[idx].T
        for jj in range(1, len(idx)):
            if (sims[jj, :jj] > dataprep.SEMDEDUP_THRESHOLD).any():
                dominated.add(int(ids[idx[jj]]))
    want = sorted(set(int(i) for i in ids) - dominated)
    assert got == want
    assert 0 < len(dominated) < t.num_rows  # threshold really bites


def test_semdedup_crafted_cross_cluster(tmp_path):
    """Two identical-direction vectors always share the argmax cluster, so
    SemDeDup removes the larger id even on a crafted table; an orthogonal
    vector survives regardless of its cluster."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    rows = np.stack([base, base * 3.0]
                    + [rng.standard_normal(64) for _ in range(30)])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(rows)), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in rows.astype(np.float32)],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(rows), type=pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = sorted(to_df(dataprep.docs_semdedup_ds(str(tmp_path)))["vec_id"])
    assert 1 not in got  # scaled copy of 0: same cluster, cosine 1 → dropped
    assert 0 in got


def test_sample_hash_deterministic_and_rate(sf_dir):
    a = sorted(to_df(dataprep.docs_sample_hash(sf_dir))["doc_id"])
    b = sorted(to_df(dataprep.docs_sample_hash(sf_dir))["doc_id"])
    assert a == b  # rerun-stable
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rate = len(a) / t.num_rows
    assert 0.1 < rate < 0.35  # ~20% nominal


def test_mixture_sample_flattens_sources(tmp_path):
    """alpha=0.5 rebalancing: the dominant source is downsampled much
    harder than the minority source, and the draw is deterministic."""
    words = " ".join(f"w{i}" for i in range(50))
    texts = [words] * 110
    t = pa.table(
        {"doc_id": pa.array(range(110), type=pa.int64()),
         "text": pa.array(texts),
         "source": pa.array(["big"] * 100 + ["small"] * 10)}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    df = to_df(dataprep.docs_mixture_sample(str(tmp_path)))
    kept = df.groupby("source").size()
    rate_big = kept.get("big", 0) / 100
    rate_small = kept.get("small", 0) / 10
    # sqrt-flattening: rates ~0.167 vs ~0.526 for a 10:1 token imbalance
    assert rate_small > rate_big > 0
    df2 = to_df(dataprep.docs_mixture_sample(str(tmp_path)))
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id").reset_index(drop=True),
        df2.sort_values("doc_id").reset_index(drop=True),
    )


def test_topk_per_source_ties_and_cap(tmp_path):
    """k-cap per group and deterministic tie-break (equal lengths -> min
    doc_id wins the last slot)."""
    texts = (["three words here"] * 8          # src a: 8 equal-length docs
             + ["two words", "one", "a b c d five words yes"])  # src b
    t = pa.table(
        {"doc_id": pa.array(range(11), type=pa.int64()),
         "text": pa.array(texts),
         "source": pa.array(["a"] * 8 + ["b"] * 3)}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    df = to_df(dataprep.docs_topk_per_source(str(tmp_path), k=5))
    a = df[df["source"] == "a"]
    assert list(a["doc_id"]) == [0, 1, 2, 3, 4]  # ties -> smallest ids
    b = df[df["source"] == "b"]
    assert list(b["doc_id"]) == [10, 8, 9]  # 7 > 2 > 1 tokens, all kept


def test_vocab_topk_matches_counter(sf_dir):
    got = to_df(dataprep.docs_vocab_topk(sf_dir))
    import collections

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    c = collections.Counter(
        w for x in t["text"].to_pylist() for w in x.lower().split()
    )
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:dataprep.VOCAB_TOP_K]
    assert list(zip(got["word"], got["cnt"])) == want


def test_decontaminate_crafted(tmp_path):
    from pgweasel_ray import hashing as H

    bench = "the secret benchmark question about unicorns and rainbows"
    texts = (
        [bench] * dataprep.DECONTAM_BENCH_MAX_ID  # benchmark ids 0..9
        + [
            "completely unrelated corpus document with its own vocabulary",
            "another clean document that shares nothing with the benchmark",
            "a contaminated one: the secret benchmark question appears here",
        ]
    )
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = sorted(to_df(dataprep.docs_decontaminate(str(tmp_path)))["doc_id"])
    assert got == [10, 11]  # 12 shares the "the secret benchmark" shingles


def test_repetition_crafted(tmp_path):
    texts = [
        "same line\nsame line\nsame line\nunique line",  # dup lines
        "spam spam spam spam spam spam",                  # one bigram only
        "a perfectly normal sentence with varied words and no repeats",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = to_df(dataprep.docs_repetition(str(tmp_path))).set_index("doc_id")
    assert got.loc[0, "dup_line_frac"] == 0.5  # 2 distinct of 4 lines
    assert got.loc[0, "is_repetitive"]
    assert got.loc[1, "top_bigram_frac"] == 1.0
    assert got.loc[1, "is_repetitive"]
    assert not got.loc[2, "is_repetitive"]


def test_corpus_prep_ds_sink_matches_collected(sf_dir, tmp_path):
    """The corpus-scale path: corpus_prep_ds returns a lazy Dataset whose
    parquet sink holds exactly the ids the query contract collects — the
    composed recipe is runnable end-to-end without landing survivors on
    the driver."""
    ds = dataprep.corpus_prep_ds(sf_dir)
    ds.write_parquet(str(tmp_path / "survivors"))
    import duckdb

    sunk = sorted(
        duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{tmp_path}/survivors/*.parquet')"
        ).df()["doc_id"]
    )
    collected = sorted(to_df(dataprep.corpus_prep_ds(sf_dir))["doc_id"])
    assert sunk == collected
    assert len(sunk) > 0


def test_bench_gram_read_is_pushed_down(sf_dir, monkeypatch):
    """The benchmark-doc extraction must never materialize the corpus on
    the driver: the doc_id predicate is passed as ``filters=`` into the
    parquet read (row-group pruning), and the rows that reach the driver
    are exactly the benchmark rows."""
    import pyarrow.parquet as real_pq

    calls = {}
    orig = real_pq.read_table

    def spy(path, *args, **kwargs):
        calls["filters"] = kwargs.get("filters")
        out = orig(path, *args, **kwargs)
        calls["rows"] = out.num_rows
        return out

    monkeypatch.setattr(real_pq, "read_table", spy)
    bench = dataprep._bench_gram_set(sf_dir)
    assert calls["filters"] == [("doc_id", "<", dataprep.DECONTAM_BENCH_MAX_ID)]
    assert calls["rows"] <= dataprep.DECONTAM_BENCH_MAX_ID
    assert len(bench) > 0


def test_decontaminate_empty_benchmark_matches_oracle(tmp_path):
    """A corpus with NO benchmark docs (all doc_id >= the benchmark cutoff)
    must keep every doc — on BOTH sides (the oracle's empty gram list is
    coalesced to [], not NULL)."""
    import duckdb

    from pgweasel_ray import oracle_queries

    texts = ["some corpus document number %d with plain words" % i
             for i in range(5)]
    ids = [dataprep.DECONTAM_BENCH_MAX_ID + i for i in range(len(texts))]
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = sorted(to_df(dataprep.docs_decontaminate(str(tmp_path)))["doc_id"])
    assert got == ids
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    ora = sorted(con.sql(oracle_queries._decontaminate_sql()).df()["doc_id"])
    assert ora == ids


def test_length_quantiles_exact(sf_dir):
    got = dataprep.docs_length_quantiles(sf_dir)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    lens = sorted(len(x.split()) for x in t["text"].to_pylist())
    for _, row in got.iterrows():
        idx = int(row["pct"]) * (len(lens) - 1) // 100
        assert row["n_tokens"] == lens[idx]


def test_scrub_crafted(tmp_path):
    texts = [
        "contact me at alice@example.com or visit https://example.com/a?x=1 now",
        "server 192.168.0.1 responded; backup at 10.0.0.255 did not",
        "no pii here at all",
        "mixed https://u:p@host.example/x and bob.smith+tag@mail.co.uk and 8.8.8.8",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = to_df(dataprep.docs_scrub(str(tmp_path))).set_index("doc_id")
    assert got.loc[0, "text_scrubbed"] == "contact me at <EMAIL> or visit <URL> now"
    assert got.loc[1, "text_scrubbed"] == "server <IP> responded; backup at <IP> did not"
    assert got.loc[2, "text_scrubbed"] == "no pii here at all"
    # URL rule runs first, so the URL's embedded user@host never half-matches
    assert got.loc[3, "text_scrubbed"] == "mixed <URL> and <EMAIL> and <IP>"


def test_token_stats_matches_python(sf_dir):
    got = to_df(dataprep.docs_token_stats(sf_dir)).set_index("doc_id")
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas().set_index("doc_id")
    sample = t.head(20)
    for doc_id, row in sample.iterrows():
        assert got.loc[doc_id, "n_tokens"] == len(row["text"].split())
        assert got.loc[doc_id, "n_chars"] == len(row["text"])


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )


def test_normalize_crafted(tmp_path):
    texts = [
        "  Hello\t\tWORLD  ",
        "one\ntwo\r\nthree\f four",
        "",
        "already clean",
    ]
    pq.write_table(_docs_table(texts), tmp_path / "documents.parquet")
    got = to_df(dataprep.docs_normalize(str(tmp_path))).set_index("doc_id")
    assert got.loc[0, "text_norm"] == "hello world"
    assert got.loc[1, "text_norm"] == "one two three four"
    assert got.loc[2, "text_norm"] == ""
    assert got.loc[3, "text_norm"] == "already clean"
    assert got.loc[1, "n_chars"] == len("one two three four")


def test_dedup_chunks_crafted(tmp_path):
    cw = dataprep.CHUNK_WORDS
    base = [f"w{i}" for i in range(cw)]          # one full chunk
    tail = ["x", "y", "z"]                        # one partial chunk
    texts = [
        " ".join(base + tail),        # doc 0: chunks (0,0) and (0,1)
        " ".join(base),               # doc 1: chunk == doc 0's chunk 0 → dup
        " ".join(tail),               # doc 2: chunk != (x y z is its chunk 0,
                                      #          same words as doc 0 chunk 1)
        "",                           # doc 3: no tokens → no chunks
    ]
    pq.write_table(_docs_table(texts), tmp_path / "documents.parquet")
    got = to_df(dataprep.dedup_chunks(str(tmp_path)))
    kept = set(map(tuple, got[["doc_id", "chunk_idx"]].values))
    # doc1's only chunk is a copy of (0,0); doc2's chunk TEXT equals doc0's
    # partial chunk 1 ("x y z"), so it is deduped against (0,1) as well
    assert kept == {(0, 0), (0, 1)}


def test_shuffle_order_is_permutation_and_deterministic(sf_dir):
    got = to_df(dataprep.docs_shuffle_order(sf_dir)).sort_values("pos")
    n = len(got)
    assert list(got["pos"]) == list(range(n))
    # rank of the affine key, recomputed in numpy
    import numpy as np

    from pgweasel_ray import hashing as H

    ids = np.sort(got["doc_id"].to_numpy())
    key = ((ids % H.P) * H.SHUF_A + H.SHUF_B) % H.P
    order = np.lexsort((ids, key))
    want = {int(d): p for p, d in enumerate(ids[order])}
    for doc_id, pos in zip(got["doc_id"], got["pos"]):
        assert want[int(doc_id)] == int(pos)
    again = to_df(dataprep.docs_shuffle_order(sf_dir)).sort_values("pos")
    assert list(again["doc_id"]) == list(got["doc_id"])


def test_pack_sequences_crafted(tmp_path):
    cap = dataprep.PACK_SEQ_TOKENS
    # doc0: cap-1 tokens (seq 0), doc1: 2 tokens starting at cap-1 (seq 0,
    # straddles into seq 1), doc2: starts at cap+1 (seq 2 would be wrong —
    # floor((cap+1)/cap) = 1), doc3: empty (0 tokens, starts seq 1 too)
    texts = [
        " ".join(["a"] * (cap - 1)),
        "b c",
        "d",
        "",
    ]
    pq.write_table(_docs_table(texts), tmp_path / "documents.parquet")
    got = to_df(dataprep.docs_pack_sequences(str(tmp_path))).set_index("seq_id")
    assert got.loc[0, "n_docs"] == 2 and got.loc[0, "n_tokens"] == cap + 1
    assert got.loc[1, "n_docs"] == 2 and got.loc[1, "n_tokens"] == 1
    assert int(got["n_tokens"].sum()) == cap + 2


def test_with_global_offsets_multi_block():
    import ray.data

    tables = [
        pa.table({"doc_id": pa.array(r, type=pa.int64())})
        for r in ([0, 1, 2], [3], [], [4, 5])
    ]
    ds = ray.data.from_arrow(tables)
    out = dataprep._with_global_offsets(
        ds, dataprep._block_rows, dataprep._apply_row_offset
    )
    df = to_df(out).sort_values("doc_id")
    # block-local arange + exclusive block prefix sum == global 0..n-1
    assert list(df["pos"]) == [0, 1, 2, 3, 4, 5]


# --- incremental dedup (stateful cross-round index) --------------------------

def _hashed_ds(pairs):
    """(doc_id, text) pairs -> Dataset with (doc_id, h1, h2)."""
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([i for i, _ in pairs], type=pa.int64()),
            "text": pa.array([s for _, s in pairs], type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).map_batches(
        dataprep._content_hash, batch_format="pyarrow", zero_copy_batch=True
    )


def test_dedup_incremental_matches_exact(crafted_dir):
    got = sorted(dataprep.dedup_incremental(crafted_dir, n_rounds=2)["doc_id"])
    want = sorted(to_df(dataprep.dedup_exact(crafted_dir))["doc_id"])
    assert got == want  # id-ordered rounds == one-shot exact dedup


def test_dedup_incremental_committed_wins():
    """The genuinely stateful semantic: once a round commits a text, a
    LATER round's copy loses even with a smaller doc_id."""
    from pgweasel_ray.state.dedup_index import IncrementalDeduper

    dd = IncrementalDeduper(n_shards=2)
    r1 = dd.add_round(_hashed_ds([(10, "alpha"), (11, "beta")]))
    assert sorted(r1["doc_id"]) == [10, 11]
    # id 3 < 10, but "alpha" is already committed -> dropped
    r2 = dd.add_round(_hashed_ds([(3, "alpha"), (7, "gamma")]))
    assert sorted(r2["doc_id"]) == [7]
    assert dd.committed_size() == 3  # alpha, beta, gamma


def test_dedup_incremental_offer_idempotent():
    """Re-offering a round's batch (Ray at-least-once retry) must not
    change the survivor set: min-fold is idempotent."""
    from pgweasel_ray.state import dedup_index as di

    dd = di.IncrementalDeduper(n_shards=2)
    ds = _hashed_ds([(5, "x"), (9, "x"), (6, "y")]).materialize()
    # simulate a retried offer pass: run the offer stage twice
    for _ in range(2):
        ds.map_batches(
            di._offer_batch, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"shards": dd.shards},
        ).materialize()
    surv = ds.map_batches(
        di._survivor_batch, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"shards": dd.shards},
    ).to_pandas()
    assert sorted(surv["doc_id"]) == [5, 6]


# --- boilerplate strip -------------------------------------------------------

BOILER = " ".join(f"w{i}" for i in range(dataprep.CHUNK_WORDS))  # one chunk


@pytest.fixture(scope="module")
def boiler_dir(tmp_path_factory):
    """Docs 0-2 share an identical 16-word opening chunk (boilerplate);
    each has a distinct tail. Doc 3 is unrelated. Doc 4 is ONLY the
    boilerplate chunk (fully stripped)."""
    d = tmp_path_factory.mktemp("boiler")
    texts = [
        BOILER + " unique tail zero about engines",
        BOILER + " other tail one about arrows",
        BOILER + " third tail two about batches",
        "entirely unrelated document with no shared spans at all here",
        BOILER,
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_strip_boilerplate_crafted(boiler_dir):
    got = (
        to_df(dataprep.docs_strip_boilerplate(boiler_dir))
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got["n_removed"]) == [1, 1, 1, 0, 1]
    assert got.loc[0, "clean_text"] == "unique tail zero about engines"
    assert got.loc[3, "clean_text"] == (
        "entirely unrelated document with no shared spans at all here"
    )
    assert got.loc[4, "clean_text"] == ""  # fully boilerplate
    assert list(got["n_chunks"]) == [2, 2, 2, 1, 1]


def test_strip_boilerplate_sharded_fallback(boiler_dir, monkeypatch):
    """Forcing the flagged set over the broadcast cap must route through
    the sharded key-set actors and produce identical output."""
    want = to_df(dataprep.docs_strip_boilerplate(boiler_dir))
    monkeypatch.setattr(dataprep, "BROADCAST_ANTI_MAX", 0)
    got = to_df(dataprep.docs_strip_boilerplate(boiler_dir))
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True),
    )


# --- unigram LM surprisal ----------------------------------------------------

def test_lm_surprisal_crafted(tmp_path, monkeypatch):
    """common word scores fewer bits than a rare one; OOV counts tracked.
    Vocab capped to 2 => only the two most frequent words are in-LM."""
    monkeypatch.setattr(dataprep, "LM_VOCAB_TOP", 2)
    texts = [
        "aa aa aa aa",     # 4x aa
        "aa bb bb",        # 2x bb
        "aa cc",           # cc is OOV under the cap
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        to_df(dataprep.docs_lm_surprisal(str(tmp_path)))
        .sort_values("doc_id").set_index("doc_id")
    )
    # T=9 tokens; c(aa)=6, c(bb)=2, cc OOV (c=1)
    # bits: aa -> floor(log2(9//6=1))=0; bb -> floor(log2(4))=2; cc -> floor(log2(9))=3
    assert got.loc[0, "sum_bits"] == 0 and got.loc[0, "n_oov"] == 0
    assert got.loc[1, "sum_bits"] == 4 and got.loc[1, "n_oov"] == 0
    assert got.loc[2, "sum_bits"] == 3 and got.loc[2, "n_oov"] == 1
    assert got.loc[2, "avg_bits"] == 1.5
    # rare-token doc scores strictly higher than the common-token doc
    assert got.loc[2, "avg_bits"] > got.loc[0, "avg_bits"]


def test_floor_log2_exact_matches_bitlength():
    q = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 2**52 - 1, 2**52],
                 dtype=np.int64)
    want = np.array([int(x).bit_length() - 1 for x in q], dtype=np.int64)
    assert (dataprep._floor_log2_exact(q) == want).all()


# --- as-of join --------------------------------------------------------------

def test_events_asof_prior_crafted(tmp_path):
    from pgweasel_ray.pipelines import windows

    def ts(s):
        return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)

    rows = [
        # user 1: click@10, click@20, error@20 (tie -> click@20), error@25
        (0, ts(10), 1, "click"), (1, ts(20), 1, "click"),
        (2, ts(20), 1, "error"), (3, ts(25), 1, "error"),
        # user 2: error@5 with no prior click; click@30 after it
        (4, ts(5), 2, "error"), (5, ts(30), 2, "click"),
        # user 3: two clicks at the SAME ts@7 -> max event_id wins
        (6, ts(7), 3, "click"), (7, ts(7), 3, "click"),
        (8, ts(9), 3, "error"),
        # noise type is pre-filtered out
        (9, ts(1), 1, "view"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (
        to_df(windows.events_asof_prior(str(tmp_path)))
        .sort_values("event_id").set_index("event_id")
    )
    assert list(got.index) == [2, 3, 4, 8]
    assert got.loc[2, "prior_event_id"] == 1 and got.loc[2, "gap_us"] == 0
    assert got.loc[3, "prior_event_id"] == 1
    assert got.loc[3, "gap_us"] == 5_000_000
    assert got.loc[4, "prior_event_id"] == -1 and got.loc[4, "gap_us"] == -1
    assert got.loc[8, "prior_event_id"] == 7  # same-ts tie -> max event_id
    assert got.loc[8, "gap_us"] == 2_000_000


# --- TF-IDF top terms ---------------------------------------------------------

def test_tfidf_block_hand_case():
    """3 docs, full vocab: tf·idf_fp scores and (score desc, term asc)
    tie-breaks verified by hand."""
    import ray

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "apple apple banana",   # tf: apple 2, banana 1
            "banana cherry",
            "apple banana cherry",
        ]),
    })
    # vocab sorted by word asc; df: apple 2, banana 3, cherry 2; N = 3
    vw = np.array(["apple", "banana", "cherry"])
    df = np.array([2, 3, 2], dtype=np.int64)
    idf = (np.int64(3) << dataprep.TFIDF_FP_SHIFT) // df
    got = dataprep._tfidf_block(batch, (vw, idf)).to_pandas()
    d0 = got[got.doc_id == 0].reset_index(drop=True)
    # doc 0: apple score 2*idf(2) > banana 1*idf(3)
    assert list(d0["term"]) == ["apple", "banana"]
    assert d0.loc[0, "score"] == 2 * idf[0] and d0.loc[1, "score"] == idf[1]
    # doc 2: all tf=1 -> apple(idf 2) == cherry(idf 2) > banana(idf 3);
    # equal scores tie-break term asc -> apple before cherry
    d2 = got[got.doc_id == 2].reset_index(drop=True)
    assert list(d2["term"]) == ["apple", "cherry", "banana"]


def test_tfidf_topk_caps_at_k(tmp_path):
    words = " ".join(f"w{i}" for i in range(20))
    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array([words, "w0 w1"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["a", "a"]),
        "n_chars": pa.array([len(words), 5], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = to_df(dataprep.docs_tfidf_topk(str(tmp_path)))
    assert (got.groupby("doc_id").size() <= dataprep.TFIDF_K).all()
    assert set(got["doc_id"]) == {0, 1}


# --- HyperLogLog --------------------------------------------------------------

def test_hll_estimate_within_error():
    """Registers from the batch kernel over a 50k-distinct synthetic corpus
    estimate within 3×1.04/√m of the true count (merge across two batches
    = grouped max, replayed here with np.maximum)."""
    n = 50_000
    words = [f"tok{i:06d}" for i in range(n)]
    half = n // 2
    b1 = pa.table({"text": pa.array([" ".join(words[:half])])})
    b2 = pa.table({"text": pa.array([" ".join(words[half:] + words[:100])])})
    reg = np.zeros(dataprep.HLL_BUCKETS, dtype=np.int64)
    for b in (b1, b2):
        part = dataprep._hll_partials(b)
        np.maximum.at(reg, part["bucket"].to_numpy(),
                      part["rho"].to_numpy())
    nz = np.nonzero(reg)[0]
    est = dataprep.hll_estimate(
        pd.DataFrame({"bucket": nz, "rho": reg[nz]})
    )
    rel_err = 3 * 1.04 / np.sqrt(dataprep.HLL_BUCKETS)
    assert abs(est - n) / n < rel_err


def test_hll_registers_are_merge_invariant():
    """One batch vs two half-batches produce identical registers —
    the mergeability property the distributed grouped-max relies on."""
    words = [f"x{i}" for i in range(2000)]
    whole = dataprep._hll_partials(
        pa.table({"text": pa.array([" ".join(words)])})
    ).to_pandas().set_index("bucket")["rho"]
    reg = np.zeros(dataprep.HLL_BUCKETS, dtype=np.int64)
    for chunk in (words[:1000], words[1000:]):
        p = dataprep._hll_partials(
            pa.table({"text": pa.array([" ".join(chunk)])})
        )
        np.maximum.at(reg, p["bucket"].to_numpy(), p["rho"].to_numpy())
    merged = pd.Series(reg[reg > 0],
                       index=np.nonzero(reg)[0].astype("int64"))
    assert merged.sort_index().equals(whole.sort_index())


# --- funnel / anomaly / transitions -------------------------------------------

def test_events_funnel_crafted(tmp_path):
    from pgweasel_ray.pipelines import events as ev

    def ts(d):
        return pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)

    rows = [
        (1, ts(0), "signup"), (1, ts(3), "purchase"),   # converts
        (2, ts(0), "signup"), (2, ts(8), "purchase"),   # outside 7d window
        (3, ts(5), "purchase"), (3, ts(6), "signup"),   # purchase BEFORE signup
        (4, ts(0), "signup"),                            # never purchases
        (5, ts(2), "purchase"),                          # never signs up
        (6, ts(1), "signup"), (6, ts(0), "signup"),     # first signup = ts(0)
        (6, ts(7), "purchase"),                          # exactly at window edge
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = ev.events_funnel(str(tmp_path))
    assert int(got.loc[0, "signup_users"]) == 5   # users 1,2,3,4,6
    assert int(got.loc[0, "converted_users"]) == 2  # users 1 and 6


def test_gopher_filter_each_rule(tmp_path):
    """One doc passes; each other doc violates exactly one Gopher rule."""
    stop8 = "the and of to a in is it"
    texts = [
        stop8 + " " + " ".join(["word"] * 60),     # 0: passes all
        stop8 + " words",                           # 1: < 50 words
        stop8 + " " + " ".join(["x" * 20] * 60),    # 2: mean word len > 10
        stop8 + " " + " ".join(["#"] * 10 + ["word"] * 50),   # 3: symbols
        stop8 + " " + " ".join(["1234"] * 60),      # 4: < 80% alpha words
        " ".join(["word"] * 60),                    # 5: < 2 stopwords
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = sorted(to_df(dataprep.docs_gopher_filter(str(tmp_path)))["doc_id"])
    assert got == [0]


def test_select_budget_local_replay(sf_dir):
    """Token-budget selection vs an independent pandas replay of the exact
    rule: integer fixed-point score, (score desc, doc_id) rank, inclusive
    cumulative cut at total//SELECT_BUDGET_DEN."""
    import re

    got = (
        to_df(dataprep.docs_select_budget(sf_dir))
        .sort_values("doc_id").reset_index(drop=True)
    )
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    ntok = t["text"].map(lambda s: len(re.findall(r"\S+", s))).to_numpy()
    nstop = t["text"].map(
        lambda s: len(re.findall(dataprep.STOPWORDS_PATTERN, s.lower()))
    ).to_numpy()
    score = nstop * dataprep.SELECT_SCORE_SCALE // np.maximum(ntok, 1)
    df = pd.DataFrame(
        {"doc_id": t["doc_id"], "n_tok": ntok, "score": score}
    ).sort_values(["score", "doc_id"], ascending=[False, True])
    budget = int(df["n_tok"].sum()) // dataprep.SELECT_BUDGET_DEN
    df["cum_tok"] = df["n_tok"].cumsum()
    want = (
        df[df["cum_tok"] <= budget][["doc_id", "n_tok", "cum_tok"]]
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    assert 0 < len(got) < len(t)  # the budget really cuts


def test_select_budget_inclusive_boundary(tmp_path):
    """cum == budget keeps the doc; the next one is cut. Four 10-token docs
    with strictly descending stop-ratio scores, budget = 40//4 = 10 → only
    the best doc fits (its cum is exactly the budget)."""
    texts = [
        " ".join(["the"] * 10),            # score 1.0 → kept, cum 10 == 10
        " ".join(["the"] * 5 + ["zz"] * 5),
        " ".join(["the"] * 2 + ["zz"] * 8),
        " ".join(["zz"] * 10),
    ]
    t = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = to_df(dataprep.docs_select_budget(str(tmp_path)))
    assert list(got["doc_id"]) == [0]
    assert list(got["cum_tok"]) == [10]


def test_events_value_quantiles_crafted(tmp_path):
    from pgweasel_ray.pipelines import events as ev

    rng = np.random.default_rng(3)
    vals_a = rng.permutation(np.arange(101, dtype=np.float64))  # 0..100
    vals_b = np.array([7.0, 3.0, 11.0])
    vals = np.concatenate([vals_a, vals_b])
    types = ["a"] * len(vals_a) + ["b"] * len(vals_b)
    t = pa.table({
        "event_id": pa.array(range(len(vals)), type=pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * len(vals),
                       type=pa.timestamp("us")),
        "user_id": pa.array([0] * len(vals), type=pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(vals, type=pa.float64()),
        "props": pa.array(["{}"] * len(vals)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = ev.events_value_quantiles(str(tmp_path))
    a = got[got["event_type"] == "a"].set_index("pct")["value"]
    assert list(a.loc[[0, 25, 50, 75, 100]]) == [0.0, 25.0, 50.0, 75.0, 100.0]
    b = got[got["event_type"] == "b"].set_index("pct")["value"]
    # n=3: idx = pct*2//100 → 0,0,1,1,2
    assert list(b.loc[[0, 25, 50, 75, 100]]) == [3.0, 3.0, 7.0, 7.0, 11.0]


def test_evq_pick_group_spans_blocks():
    """A group split across two sorted blocks: the target rank lands in
    the SECOND block and must be located via the per-block group offset."""
    from pgweasel_ray.pipelines import events as ev

    b1 = pa.table({"event_type": pa.array(["g", "g"]),
                   "value": pa.array([1.0, 2.0])})
    b2 = pa.table({"event_type": pa.array(["g", "g", "h"]),
                   "value": pa.array([3.0, 4.0, 9.0])})
    targets = {"g": ((75, 2),), "h": ((50, 0),)}  # rank 2 of g = 3.0
    got1 = ev._evq_pick(b1, {"g": 0}, targets).to_pandas()
    got2 = ev._evq_pick(b2, {"g": 2, "h": 0}, targets).to_pandas()
    assert len(got1) == 0                      # rank 2 not in block 1
    assert list(got2["value"]) == [3.0, 9.0]   # found via offset in block 2


def test_events_retention_crafted(tmp_path):
    from pgweasel_ray.pipelines import events as ev

    def ts(d):
        return pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)

    def wk(d):
        return int(ts(d).value // 1000) // (ev.RETENTION_WEEK_S * 1_000_000)

    rows = [
        (1, ts(0)), (1, ts(1)),    # same epoch week → dedupes to offset 0
        (1, ts(15)),               # two weeks later
        (2, ts(8)),                # later cohort, single visit
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array(["visit"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = to_df(ev.events_retention(str(tmp_path)))
    want = pd.DataFrame({
        "cohort_week": [wk(0), wk(0), wk(8)],
        "week_offset": [0, wk(15) - wk(0), 0],
        "n_users": [1, 1, 1],
    }).sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), want.astype("int64")
    )
    assert wk(1) == wk(0) and wk(15) - wk(0) == 2  # the crafted geometry holds


def test_events_retention_local_replay(sf_dir):
    from pgweasel_ray.pipelines import events as ev

    got = to_df(ev.events_retention(sf_dir)).reset_index(drop=True)
    df = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    week_us = ev.RETENTION_WEEK_S * 1_000_000
    df["week"] = df["ts"].astype("datetime64[us]").astype("int64") // week_us
    cohort = df.groupby("user_id")["week"].min().rename("cohort_week")
    j = df.join(cohort, on="user_id")
    j["week_offset"] = j["week"] - j["cohort_week"]
    want = (
        j.drop_duplicates(["user_id", "week_offset"])
        .groupby(["cohort_week", "week_offset"]).size().rename("n_users")
        .reset_index().sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_events_anomaly_block_flags_spike():
    from pgweasel_ray.pipelines import events as ev

    base = [100] * 30
    t = pa.table({
        "bucket_ts": pa.array(pd.date_range("2024-01-01", periods=31,
                                            freq="h")),
        "cnt": pa.array(base + [1000], type=pa.int64()),
    })
    got = ev._anomaly_block(t).to_pandas()
    assert list(got["cnt"]) == [1000]
    flat = pa.table({
        "bucket_ts": pa.array(pd.date_range("2024-01-01", periods=31,
                                            freq="h")),
        "cnt": pa.array([100, 101, 99, 100] * 7 + [100, 101, 99],
                        type=pa.int64()),
    })
    assert ev._anomaly_block(flat).num_rows == 0


def test_transitions_block_hand_case():
    from pgweasel_ray.pipelines import windows

    # two interleaved convs; rows arrive turn-shuffled inside the block
    batch = pa.table({
        "conv_id": pa.array(["a", "b", "a", "b", "a"]),
        "turn_idx": pa.array([2, 1, 0, 0, 1], type=pa.int32()),
        "tool": pa.array(["t3", "t2", "t1", "t1", "t2"]),
    })
    got = (
        windows._transitions_block(batch).to_pandas()
        .sort_values(["from_tool", "to_tool"]).reset_index(drop=True)
    )
    # a: t1->t2->t3 ; b: t1->t2
    want = {("t1", "t2"): 2, ("t2", "t3"): 1}
    assert {(r.from_tool, r.to_tool): r.cnt
            for r in got.itertuples()} == want


def test_weighted_sample_keep_rule_against_independent_length():
    """ADVICE r4: decouple the weighted-sample check from the STORED
    n_chars column. (a) the driver fixture's n_chars really is len(text)
    — a regenerated fixture with different semantics fails here, not
    silently in both engines at once; (b) the kernel's keep set equals a
    naive per-row evaluation of u·DEN < len(text)·P on independently
    recomputed lengths."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pgweasel_ray import hashing as H
    from pgweasel_ray.pipelines.dataprep import (WSAMPLE_DEN,
                                                 _weighted_sample_filter)

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    n_indep = pc.utf8_length(t["text"]).cast(pa.int64())
    assert pc.all(pc.equal(n_indep, t["n_chars"].cast(pa.int64()))).as_py()

    recomputed = pa.table({"doc_id": t["doc_id"], "n_chars": n_indep})
    kept = set(_weighted_sample_filter(recomputed)["doc_id"].to_pylist())
    naive = {
        int(i) for i, txt in zip(t["doc_id"].to_pylist(),
                                 t["text"].to_pylist())
        if ((int(i) % H.P) * H.SAMPLE_A + H.SAMPLE_B) % H.P * WSAMPLE_DEN
        < len(txt) * H.P
    }
    assert kept == naive and len(kept) > 0
