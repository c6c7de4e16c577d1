"""Parity tests for pgweasel_ray.hashing: the vectorized numpy kernels, the
scalar reference definitions, and the generated DuckDB SQL must all agree —
this is what makes the dedup/ANN/fingerprint oracles meaningful."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pgweasel_ray import hashing as H

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the sleepy dog",
    "",
    "a b",
    "one",
    "Hello, World! 123 mixed CASE text with  double spaces",
    "x" * 300,
    "word " * 50,
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    t = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
            "text": pa.array(TEXTS),
        }
    )
    c.register("documents", t)
    return c


def test_vectorized_word_hashes_match_scalar():
    for t in TEXTS:
        w = H.tokens(t)
        assert H.word_hash_array(w).tolist() == [H.poly_hash(x) for x in w]
        assert H.word_hash_array(w, H.B2).tolist() == [
            H.poly_hash(x, H.B2) for x in w
        ]


def test_vectorized_gram_hashes_match_scalar():
    for t in TEXTS:
        w = H.tokens(t)
        assert H.gram_hash_array(w).tolist() == [
            H.poly_hash(g) for g in H.shingles(w)
        ]


def test_batch_doc_kernels_match_scalar():
    got_mh = H.minhash_bands_docs(TEXTS)
    got_sh = H.simhash62_docs(TEXTS)
    got_fp = H.fingerprint_docs(TEXTS)
    values, offsets = H.gram_sets_docs(TEXTS)
    for i, t in enumerate(TEXTS):
        assert got_mh[i].tolist() == H.band_hashes(
            H.minhash_signature(H.gram_hashes(t))
        ).tolist()
        assert got_sh[i] == H.simhash62(H.tokens(t))
        assert got_fp[i] == H.fingerprint(t)
        want = np.unique(H.gram_hash_array(H.tokens(t)))
        assert values[offsets[i]:offsets[i + 1]].tolist() == want.tolist()


def test_sql_poly_hash_matches_python(con):
    got = [
        r[0]
        for r in con.sql(
            f"SELECT list_transform({H.sql_words()}, x -> "
            f"{H.sql_poly_hash('x')}) FROM documents ORDER BY doc_id"
        ).fetchall()
    ]
    want = [[H.poly_hash(w) for w in H.tokens(t)] for t in TEXTS]
    assert got == want


def test_sql_minhash_bands_match_python(con):
    want = {}
    for i, t in enumerate(TEXTS):
        bh = H.band_hashes(H.minhash_signature(H.gram_hashes(t)))
        for b in range(H.MH_BANDS):
            want[(i, b)] = int(bh[b])
    q = (f"WITH {H.sql_minhash_bands_cte()} "
         f"SELECT doc_id, band, band_hash FROM bands")
    got = {(r[0], r[1]): r[2] for r in con.sql(q).fetchall()}
    assert got == want


def test_sql_simhash_matches_python(con):
    q = f"WITH {H.sql_simhash_cte()} SELECT doc_id, simhash FROM sims"
    got = dict(con.sql(q).fetchall())
    for i, t in enumerate(TEXTS):
        assert got[i] == H.simhash62(H.tokens(t))


def test_sql_fingerprint_matches_python(con):
    got = dict(con.sql(H.sql_fingerprint_select()).fetchall())
    for i, t in enumerate(TEXTS):
        assert got[i] == H.fingerprint(t)


def test_minhash_bands_chunked_matches_unchunked(monkeypatch):
    """The gram-chunked permutation path (bounded transient memory) must be
    bit-identical to the single-pass path, including when chunk boundaries
    fall INSIDE a document's gram run."""
    texts = TEXTS + ["lorem ipsum dolor sit amet " * 40]  # a long doc
    want = H.minhash_bands_docs(texts)
    monkeypatch.setattr(H, "MH_GRAM_CHUNK", 7)  # many intra-doc boundaries
    got = H.minhash_bands_docs(texts)
    assert got.tolist() == want.tolist()


def test_tokens_matches_re2_whitespace_class():
    """tokens() must follow RE2's ASCII \\s (DuckDB '\\S+'), NOT Python
    str.split's Unicode whitespace — \\x0b etc. stay inside a token."""
    t = "a\x0bb c\x1cd e\xa0f g\th"
    assert H.tokens(t) == ["a\x0bb", "c\x1cd", "e\xa0f", "g", "h"]
    import duckdb

    got = duckdb.sql(
        "SELECT regexp_extract_all(lower(?), '\\S+')", params=[t]
    ).fetchone()[0]
    assert got == H.tokens(t)


def test_sql_emb_nd_bucket_matches_numpy(con):
    rng = np.random.default_rng(10)
    emb = rng.standard_normal((20, 16)).astype(np.float32)
    et = pa.table(
        {
            "vec_id": pa.array(range(20), type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    con.register("em16nd", et)
    planes = H.emb_nd_planes(16)
    bits = (emb.astype(np.float64) @ planes) > 0
    want = (
        (bits * (1 << np.arange(H.EMB_ND_PLANES))).sum(axis=1).astype(np.int64)
    ).tolist()
    q = (f"SELECT {H.sql_emb_nd_bucket_expr('embedding', 16)} "
         f"FROM em16nd ORDER BY vec_id")
    got = [r[0] for r in con.sql(q).fetchall()]
    assert got == want


def test_sql_lsh_bucket_matches_numpy(con):
    rng = np.random.default_rng(9)
    emb = rng.standard_normal((20, 16)).astype(np.float32)
    et = pa.table(
        {
            "vec_id": pa.array(range(20), type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    con.register("em16", et)
    planes = H.lsh_planes(16)
    bits = (emb.astype(np.float64) @ planes) > 0
    want = (
        (bits * (1 << np.arange(H.LSH_N_PLANES))).sum(axis=1).astype(np.int64)
    ).tolist()
    q = (f"SELECT {H.sql_lsh_bucket_expr('embedding', 16)} "
         f"FROM em16 ORDER BY vec_id")
    got = [r[0] for r in con.sql(q).fetchall()]
    assert got == want


def test_prefix_length_guarantee_brute_force():
    """Exhaustive check of the prefix-filter recall guarantee on random
    small universes: every pair with J >= t shares a prefix element."""
    rng = np.random.default_rng(3)
    for _ in range(200):
        a = np.unique(rng.integers(0, 30, rng.integers(1, 15)))
        b = np.unique(rng.integers(0, 30, rng.integers(1, 15)))
        inter = len(np.intersect1d(a, b, assume_unique=True))
        union = len(a) + len(b) - inter
        if H.JC_DEN * inter >= H.JC_NUM * union:
            pa_, pb_ = H.prefix_length(len(a)), H.prefix_length(len(b))
            shared = np.intersect1d(a[:pa_], b[:pb_], assume_unique=True)
            assert len(shared) > 0, (a, b)


def test_minhash_signature_estimates_jaccard():
    """The statistical property that MAKES it MinHash (independent of the
    SQL-parity checks): the fraction of agreeing signature slots is an
    unbiased estimator of the true shingle-set Jaccard similarity."""
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(400)]
    base = [vocab[i] for i in rng.integers(0, len(vocab), 120)]
    for replace_frac in (0.0, 0.1, 0.3, 0.6):
        other = list(base)
        k = int(len(base) * replace_frac)
        for pos in rng.choice(len(base), size=k, replace=False):
            other[pos] = f"x{pos}"
        a, b = " ".join(base), " ".join(other)
        ga = set(H.gram_hashes(a).tolist())
        gb = set(H.gram_hashes(b).tolist())
        true_j = len(ga & gb) / len(ga | gb)
        sig_a = H.minhash_signature(H.gram_hashes(a))
        sig_b = H.minhash_signature(H.gram_hashes(b))
        est = float((sig_a == sig_b).mean())
        assert abs(est - true_j) < 0.17, (replace_frac, true_j, est)


def test_fingerprint_properties():
    assert H.fingerprint("abc") == H.fingerprint("abc")
    assert H.fingerprint("") == H.fingerprint("")  # all-pad window
    assert 0 <= H.fingerprint("xyz" * 100) < H.P
