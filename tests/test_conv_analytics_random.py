"""Randomized DuckDB-vs-kernel parity for the round-5 conversational
analytics. A whole random transcript table is trivially one conv-exclusive
partition, so each block kernel applied once must equal its oracle SQL —
distribution-independent evidence with gaps, bursts, shuffled row order,
and adversarial turn spacing, no Ray session needed."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pgweasel_ray.pipelines.core import _burst_block
from pgweasel_ray.pipelines.windows import (
    _context_growth_block,
    _latency_block,
    _truncate_block,
)

ROLES = ["user", "assistant", "system", "tool", "operator"]
TOOLS = ["search", "exec", "browse", "none"]


def _random_transcripts(seed: int, n_convs: int = 25) -> pa.Table:
    rng = np.random.default_rng(seed)
    conv, turn, role, tool, ts, text = [], [], [], [], [], []
    t0 = np.datetime64("2025-05-21T10:00:00", "us")
    for c in range(n_convs):
        n = int(rng.integers(1, 30))
        # non-dense turn_idx with occasional gaps (tests the
        # turn_idx-arithmetic run definition)
        idxs = np.cumsum(rng.choice([1, 1, 1, 2, 3], size=n))
        t = t0 + np.cumsum(rng.integers(1, 5_000_000, n)).astype(
            "timedelta64[us]"
        )
        for i in range(n):
            conv.append(f"c{c:03d}")
            turn.append(int(idxs[i]))
            role.append(ROLES[int(rng.integers(0, len(ROLES)))])
            tool.append(TOOLS[int(rng.integers(0, len(TOOLS)))])
            ts.append(t[i])
            nw = int(rng.integers(0, 12))
            words = ["ERROR: boom" if rng.random() < 0.25 else "ok"]
            words += [f"w{int(rng.integers(0, 50))}" for _ in range(nw)]
            text.append(" ".join(words))
    tbl = pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(turn, type=pa.int64()),
        "role": pa.array(role, type=pa.string()),
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(np.array(ts), type=pa.timestamp("us")),
        "text": pa.array(text, type=pa.string()),
    })
    # shuffle row order: kernels must not rely on input order
    perm = rng.permutation(tbl.num_rows)
    return tbl.take(pa.array(perm))


@pytest.fixture(scope="module", params=[7, 42, 1234])
def rand_tbl(request):
    return _random_transcripts(request.param)


def _sql(tbl: pa.Table, q: str):
    con = duckdb.connect()
    con.register("tr", tbl)
    return con.sql(q).arrow().to_pydict()


def test_latency_kernel_matches_sql(rand_tbl):
    got = _latency_block(rand_tbl).sort_by("tool").to_pydict()
    want = _sql(rand_tbl, """
WITH t AS (
  SELECT conv_id, role, tool, epoch_us(ts) AS ts_us,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_ts
  FROM tr
)
SELECT tool, count(*)::BIGINT AS n_resp,
       sum(ts_us - prev_ts)::BIGINT AS sum_lat_us,
       min(ts_us - prev_ts)::BIGINT AS min_lat_us,
       max(ts_us - prev_ts)::BIGINT AS max_lat_us
FROM t WHERE prev_role = 'user' AND role = 'assistant'
GROUP BY tool ORDER BY tool""")
    assert got == want


def test_context_growth_kernel_matches_sql(rand_tbl):
    got = _context_growth_block(rand_tbl)
    got = got.sort_by([("conv_id", "ascending"),
                       ("turn_idx", "ascending")]).to_pydict()
    want = _sql(rand_tbl, """
SELECT conv_id, turn_idx::BIGINT AS turn_idx,
       length(text)::BIGINT AS n_chars,
       sum(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx
                               ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_chars
FROM tr ORDER BY conv_id, turn_idx""")
    assert got == want


@pytest.mark.parametrize("budget", [0, 5, 17, 10_000])
def test_truncate_kernel_matches_sql(rand_tbl, budget):
    got = _truncate_block(rand_tbl, budget=budget)
    got = got.sort_by("conv_id").to_pydict()
    want = _sql(rand_tbl, rf"""
WITH t AS (
  SELECT conv_id, turn_idx,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS toks
  FROM tr
), s AS (
  SELECT conv_id, turn_idx, toks,
         sum(toks) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                         ROWS UNBOUNDED PRECEDING) AS suffix_total
  FROM t
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(CASE WHEN suffix_total <= {budget} THEN 1 ELSE 0 END)::BIGINT
         AS n_kept,
       sum(CASE WHEN suffix_total <= {budget} THEN toks ELSE 0 END)::BIGINT
         AS kept_tokens,
       coalesce(min(CASE WHEN suffix_total <= {budget} THEN turn_idx END),
                -1)::BIGINT AS first_kept_turn
FROM s GROUP BY conv_id ORDER BY conv_id""")
    assert got == want


def test_burst_kernel_matches_sql(rand_tbl):
    # error rows only (the pipeline filters before the shuffle); the
    # 'ERROR: boom' plant maps to severity error in the parse kernels,
    # but here we test the run-length kernel itself on a direct subset
    mask = pa.compute.match_substring(rand_tbl["text"], "ERROR:")
    errs = rand_tbl.filter(mask)
    got = _burst_block(errs).sort_by("conv_id").to_pydict()
    want = _sql(errs, """
WITH e AS (
  SELECT conv_id, turn_idx,
         turn_idx - row_number() OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS grp
  FROM tr
), runs AS (
  SELECT conv_id, count(*) AS run_len FROM e GROUP BY conv_id, grp
)
SELECT conv_id, max(run_len)::BIGINT AS max_run,
       sum(run_len)::BIGINT AS n_error_turns
FROM runs GROUP BY conv_id ORDER BY conv_id""")
    assert got == want


def test_session_splits_kernel_matches_sql(rand_tbl):
    from pgweasel_ray.pipelines.windows import _session_splits_block

    got = _session_splits_block(rand_tbl, gap_us=2_500_000)
    got = got.sort_by("conv_id").to_pydict()
    want = _sql(rand_tbl, """
WITH t AS (
  SELECT conv_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id
                                                ORDER BY turn_idx) AS gap
  FROM tr
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       (1 + sum(CASE WHEN gap > 2500000 THEN 1 ELSE 0 END))::BIGINT
         AS n_sessions,
       coalesce(max(gap), -1)::BIGINT AS max_gap_us,
       (max(ts_us) - min(ts_us))::BIGINT AS span_us
FROM t GROUP BY conv_id ORDER BY conv_id""")
    assert got == want


# --- winnowing ----------------------------------------------------------------

def _random_docs(seed: int, n_docs: int = 40) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n_docs):
        nw = int(rng.integers(0, 25))   # includes sub-shingle docs (pad path)
        texts.append(" ".join(f"w{int(rng.integers(0, 12))}"
                              for _ in range(nw)))
    # plant exact repeats so equal gram hashes (tie rule) actually occur
    for _ in range(5):
        a, b = rng.integers(0, n_docs, 2)
        texts[b] = texts[a] + " " + texts[a]
    return pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


@pytest.mark.parametrize("seed", [3, 99, 2024])
def test_winnowing_kernel_matches_sql(seed):
    from pgweasel_ray.oracle_queries import _winnowing_sql
    from pgweasel_ray.pipelines.dataprep import _winnow_block

    docs = _random_docs(seed)
    got = _winnow_block(docs).sort_by("doc_id").to_pydict()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(_winnowing_sql()).arrow().to_pydict()
    assert got == want


def test_winnowing_selects_rightmost_min_on_ties():
    from pgweasel_ray import hashing as H
    from pgweasel_ray.pipelines.dataprep import WINNOW_W, _winnow_block

    # one doc of a single repeated word: every gram hash is equal, so each
    # window's rightmost position wins -> selected set = {W-1, W, ..., m-1}
    n_words = 12
    doc = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([" ".join(["same"] * n_words)]),
    })
    out = _winnow_block(doc).to_pydict()
    m = n_words - H.MH_SHINGLE + 1               # gram count
    assert out["n_grams"] == [m]
    assert out["n_fp"] == [m - WINNOW_W + 1]     # rightmost of each window
    assert out["n_distinct_fp"] == [1]           # all the same hash value
    g = H.gram_hashes(" ".join(["same"] * n_words))
    assert out["fp_xor"] == [int(g[0])]


def test_winnowing_guarantee_shared_run_shares_a_fingerprint():
    """The winnowing property: two docs sharing a run of >= W + n - 1
    tokens (W windows over the shared grams) share >= 1 fingerprint."""
    from pgweasel_ray import hashing as H
    from pgweasel_ray.pipelines.dataprep import WINNOW_W, _winnow_block

    shared = " ".join(f"s{i}" for i in range(WINNOW_W + H.MH_SHINGLE + 2))
    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array([f"aaa bbb {shared}", f"{shared} ccc ddd eee"]),
    })
    # recompute the selected hash SETS per doc via the kernel's own parts:
    out = _winnow_block(docs)
    assert out.num_rows == 2
    # xor alone can't prove intersection; assert via a direct re-selection
    texts = docs["text"].to_pylist()
    sets = []
    for t in texts:
        one = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                        "text": pa.array([t])})
        # distinct fp hashes = n_distinct_fp; recover the set by brute
        # force: all gram hashes that are window minima
        g = H.gram_hashes(t)
        key = g * (1 << 21) - np.arange(len(g), dtype=np.int64)
        sel = set()
        for p in range(max(len(g) - WINNOW_W + 1, 1)):
            w = key[p:p + WINNOW_W]
            sel.add(int(g[p + int(np.argmin(w))]))
        sets.append(sel)
    assert sets[0] & sets[1], "shared run must share a fingerprint"


@pytest.mark.parametrize("seed", [5, 77])
def test_winnow_sim_pairs_kernel_matches_sql(seed):
    """Full pair set (pre-top-k): one block holds every fingerprint, so
    _winnow_fp_rows + _winnow_pairs_block equals the SQL join including
    the hot-fingerprint cap."""
    from pgweasel_ray.pipelines.dataprep import (
        WINNOW_HOT_CAP,
        _winnow_fp_rows,
        _winnow_pairs_block,
    )

    docs = _random_docs(seed, n_docs=50)
    fp = _winnow_fp_rows(docs)
    got = _winnow_pairs_block(fp)
    got = got.rename_columns(["a", "b", "n_shared"]) \
        .sort_by([("a", "ascending"), ("b", "ascending")]).to_pydict()
    con = duckdb.connect()
    con.register("fph", fp)
    want = con.sql(f"""
WITH ok AS (
  SELECT h FROM fph GROUP BY h
  HAVING count(*) >= 2 AND count(*) <= {WINNOW_HOT_CAP}
)
SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS n_shared
FROM fph x JOIN fph y ON x.h = y.h AND x.doc_id < y.doc_id
JOIN ok ON ok.h = x.h
GROUP BY x.doc_id, y.doc_id ORDER BY a, b""").arrow().to_pydict()
    assert got == want


# --- naive-reference fuzz (independent of BOTH the kernel and the SQL) --------

def _naive_winnow(text: str):
    """Textbook winnowing (Schleimer et al. 2003 Fig. 5 shape): explicit
    per-window scan with the rightmost-min tie rule, over gram_hashes()."""
    from pgweasel_ray import hashing as H
    from pgweasel_ray.pipelines.dataprep import WINNOW_W

    g = [int(x) for x in H.gram_hashes(text)]
    m = len(g)
    sel = set()                                   # (pos, hash)
    for p in range(max(m - WINNOW_W + 1, 1)):
        window = g[p:p + WINNOW_W]
        best, best_pos = None, None
        for off, hv in enumerate(window):         # rightmost min: <= keeps
            if best is None or hv <= best:        # replacing on ties
                best, best_pos = hv, p + off
        sel.add((best_pos, best))
    return sel


@pytest.mark.parametrize("seed", [1, 13, 555])
def test_winnow_kernel_matches_naive_reference(seed):
    from pgweasel_ray.pipelines.dataprep import _winnow_block

    docs = _random_docs(seed, n_docs=30)
    out = _winnow_block(docs).to_pydict()
    for i, text in enumerate(docs["text"].to_pylist()):
        sel = _naive_winnow(text)
        hashes = {h for _, h in sel}
        row = out["doc_id"].index(i)
        assert out["n_fp"][row] == len(sel), f"doc {i}: position count"
        assert out["n_distinct_fp"][row] == len(hashes), f"doc {i}"
        xor = 0
        for h in hashes:
            xor ^= h
        assert out["fp_xor"][row] == xor, f"doc {i}: xor"


def _naive_truncate(turns, budget):
    """Explicit backwards walk: keep turns from the end while the running
    token total stays within budget."""
    kept, total = [], 0
    for turn_idx, toks in sorted(turns, reverse=True):
        if total + toks > budget:
            break
        total += toks
        kept.append(turn_idx)
    return len(kept), total, (min(kept) if kept else -1)


@pytest.mark.parametrize("seed", [21, 84])
def test_truncate_kernel_matches_naive_reference(seed):
    from pgweasel_ray.pipelines.windows import _truncate_block

    rng = np.random.default_rng(seed)
    tbl = _random_transcripts(seed, n_convs=15)
    budget = int(rng.integers(1, 40))
    out = _truncate_block(tbl, budget=budget).sort_by("conv_id").to_pydict()
    # group turns per conv from the raw table
    convs = {}
    for cid, tix, text in zip(tbl["conv_id"].to_pylist(),
                              tbl["turn_idx"].to_pylist(),
                              tbl["text"].to_pylist()):
        convs.setdefault(cid, []).append((tix, len(text.split())))
    for row, cid in enumerate(out["conv_id"]):
        n_kept, kept_tokens, first = _naive_truncate(convs[cid], budget)
        assert out["n_kept"][row] == n_kept, (cid, budget)
        assert out["kept_tokens"][row] == kept_tokens, (cid, budget)
        assert out["first_kept_turn"][row] == first, (cid, budget)


@pytest.mark.parametrize("seed", [9, 310])
def test_handoffs_kernel_matches_sql_lag(seed):
    """_handoffs_block on the whole (trivially conv-exclusive) random
    table must equal the oracle's lag() pair counts — including the
    shuffled-input-order and sparse-turn_idx cases."""
    from pgweasel_ray.pipelines.windows import _handoffs_block

    tbl = _random_transcripts(seed, n_convs=25)
    got = _handoffs_block(tbl).to_pandas().sort_values(
        ["from_role", "to_role"]).reset_index(drop=True)
    want = _sql(tbl, """
        WITH t AS (
          SELECT conv_id, role,
                 lag(role) OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx) AS prev
          FROM tr
        )
        SELECT prev AS from_role, role AS to_role,
               count(*)::BIGINT AS cnt
        FROM t WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""")
    assert got["from_role"].tolist() == want["from_role"]
    assert got["to_role"].tolist() == want["to_role"]
    assert got["cnt"].tolist() == want["cnt"]
