"""Property-based parity fuzzing for pgweasel_ray.hashing: on arbitrary
ASCII corpora the vectorized numpy kernels, the scalar definitions, and the
generated DuckDB SQL must agree exactly (the oracle-validity property)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pgweasel_ray import hashing as H

# printable ASCII incl. space — deliberately includes quotes/commas/control-
# adjacent chars — PLUS the whitespace codepoints where Python str.split and
# RE2 '\S+' disagree (\x0b \x1c-\x1f \x85 \xa0: Unicode whitespace that RE2's
# ASCII \s does NOT split on). tokens() must follow RE2 for oracle parity.
ascii_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x7E,
        include_characters="\x0b\x1c\x1d\x1e\x1f\x85\xa0\t",
    ),
    max_size=120,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=6))
def test_vectorized_equals_scalar(texts):
    for t in texts:
        w = H.tokens(t)
        assert H.word_hash_array(w).tolist() == [H.poly_hash(x) for x in w]
        assert H.gram_hash_array(w).tolist() == [
            H.poly_hash(g) for g in H.shingles(w)
        ]
        h = (H.word_hash_array(w, H.B1)
             | (H.word_hash_array(w, H.B2) << np.int64(31)))
        assert H.simhash62_batch(h) == H.simhash62(w)


@settings(max_examples=15, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=5))
def test_sql_matches_python_on_random_corpus(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
    )
    # fingerprint
    got = dict(con.sql(H.sql_fingerprint_select()).fetchall())
    for i, t in enumerate(texts):
        assert got[i] == H.fingerprint(t), ("fingerprint", t)
    # simhash
    got = dict(
        con.sql(
            f"WITH {H.sql_simhash_cte()} SELECT doc_id, simhash FROM sims"
        ).fetchall()
    )
    for i, t in enumerate(texts):
        assert got[i] == H.simhash62(H.tokens(t)), ("simhash", t)
    # minhash band keys
    want = {}
    for i, t in enumerate(texts):
        bh = H.band_hashes(H.minhash_signature(H.gram_hashes(t)))
        for b in range(H.MH_BANDS):
            want[(i, b)] = int(bh[b])
    got = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            f"WITH {H.sql_minhash_bands_cte()} "
            f"SELECT doc_id, band, band_hash FROM bands"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=10_000))
def test_prefix_length_bounds(m):
    pl = H.prefix_length(m)
    assert 1 <= pl <= m
    # J >= t requires overlap >= ceil(t*m); the suffix beyond the prefix has
    # ceil(t*m) - 1 elements, strictly fewer than any qualifying overlap
    ceil_tm = -((-H.JC_NUM * m) // H.JC_DEN)
    assert m - pl == min(m, ceil_tm) - 1 or pl == 1
