"""Round-5 conversational-analytics kernels: response latency, role
balance, context growth, context truncation, error bursts. These test the
per-partition block functions directly (pure pa.Table -> pa.Table) so the
edge cases — non-adjacent pairs, turn_idx gaps, budget boundaries — are
pinned independently of the sf-fixture oracle sweep."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pgweasel_ray.pipelines.core import _burst_block
from pgweasel_ray.pipelines.windows import (
    _context_growth_block,
    _latency_block,
    _role_conv_partials,
    _role_partials_block,
    _truncate_block,
)


def _tbl(**cols):
    return pa.table(cols)


def test_latency_block_counts_only_adjacent_user_assistant_pairs():
    # c1: user@0 -> assistant@5s (counted), assistant@5 -> user@7 (no),
    # user@7 -> tool@9 (no), tool@9 -> assistant@12 (no: prev not user)
    ts = pa.array(
        np.array([0, 5, 7, 9, 12], dtype="datetime64[us]")
        + np.timedelta64(0, "us")
    )
    t = _tbl(
        conv_id=["c1"] * 5,
        turn_idx=[0, 1, 2, 3, 4],
        role=["user", "assistant", "user", "tool", "assistant"],
        tool=["-", "srch", "-", "exec", "srch"],
        ts=ts,
    )
    out = _latency_block(t)
    assert out.to_pydict() == {
        "tool": ["srch"], "n_resp": [1], "sum_lat_us": [5],
        "min_lat_us": [5], "max_lat_us": [5],
    }


def test_latency_block_unsorted_input_and_cross_conv_boundary():
    # rows shuffled; conv boundary user(c1 last turn) -> assistant(c2
    # first turn) must NOT pair
    ts = np.array([100, 250, 400, 900], dtype="datetime64[us]")
    t = _tbl(
        conv_id=["c2", "c1", "c1", "c2"],
        turn_idx=[0, 0, 1, 1],
        role=["user", "user", "assistant", "assistant"],
        tool=["a", "b", "b", "a"],
        ts=pa.array(ts[[3, 0, 1, 2]]),  # deliberately misaligned order
    )
    # reconstruct: c1 turns 0,1 = user@100? — build explicitly instead
    t = _tbl(
        conv_id=["c1", "c2", "c2", "c1"],
        turn_idx=[1, 1, 0, 0],
        role=["assistant", "assistant", "user", "user"],
        tool=["b", "a", "-", "-"],
        ts=pa.array(np.array([250, 900, 400, 100], dtype="datetime64[us]")),
    )
    out = _latency_block(t).sort_by("tool").to_pydict()
    # c1: 100->250 (b, 150µs); c2: 400->900 (a, 500µs) — block emit order
    # is group-by order; the pipeline's final .sort("tool") canonicalizes
    assert out == {
        "tool": ["a", "b"], "n_resp": [1, 1], "sum_lat_us": [500, 150],
        "min_lat_us": [500, 150], "max_lat_us": [500, 150],
    }


def test_role_balance_two_phase_distinct_is_exact():
    # same (role, conv) pair split across two read blocks: partials from
    # each block, then the keyed merge must count the conv ONCE
    b1 = _tbl(conv_id=["c1", "c1"], role=["user", "user"],
              text=["ab", "cdef"])
    b2 = _tbl(conv_id=["c1", "c2"], role=["user", "user"],
              text=["x", "yy"])
    parts = pa.concat_tables([_role_conv_partials(b1),
                              _role_conv_partials(b2)])
    out = _role_partials_block(parts).to_pydict()
    assert out == {
        "role": ["user"], "n_convs": [2], "n_turns": [3 + 1],
        "sum_chars": [2 + 4 + 1 + 2], "max_chars": [4],
    }


def test_context_growth_segmented_cumsum_resets_per_conv():
    t = _tbl(
        conv_id=["b", "a", "b", "a"],
        turn_idx=[1, 0, 0, 1],
        text=["yy", "xxx", "z", "wwww"],
    )
    out = _context_growth_block(t).to_pydict()
    assert out["conv_id"] == ["a", "a", "b", "b"]
    assert out["turn_idx"] == [0, 1, 0, 1]
    assert out["n_chars"] == [3, 4, 1, 2]
    assert out["cum_chars"] == [3, 7, 1, 3]


def test_truncate_block_budget_boundaries():
    # conv a: tokens per turn (oldest->newest) 3,2,1 — budget 3 keeps the
    # last two (1+2=3 <= 3); conv b: single turn of 5 tokens > budget
    t = _tbl(
        conv_id=["a", "a", "a", "b"],
        turn_idx=[0, 1, 2, 7],
        text=["t1 t2 t3", "u1 u2", "v1", "w1 w2 w3 w4 w5"],
    )
    out = _truncate_block(t, budget=3).sort_by("conv_id").to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["n_turns"] == [3, 1]
    assert out["n_kept"] == [2, 0]
    assert out["kept_tokens"] == [3, 0]
    assert out["first_kept_turn"] == [1, -1]


def test_truncate_block_exact_budget_keeps_whole_conv():
    t = _tbl(conv_id=["a", "a"], turn_idx=[0, 1], text=["x y", "z"])
    out = _truncate_block(t, budget=3).to_pydict()
    assert out["n_kept"] == [2]
    assert out["kept_tokens"] == [3]
    assert out["first_kept_turn"] == [0]


def test_burst_block_gaps_and_islands_on_turn_idx():
    # conv a error turns: 0,1,2 (run 3), 5,6 (run 2), 9 (run 1)
    # conv b: 4 (run 1) — input deliberately unsorted
    t = _tbl(
        conv_id=["a", "b", "a", "a", "a", "a", "a"],
        turn_idx=[5, 4, 0, 9, 2, 1, 6],
    )
    out = _burst_block(t).to_pydict()
    assert out == {
        "conv_id": ["a", "b"], "max_run": [3, 1],
        "n_error_turns": [6, 1],
    }


def test_empty_blocks_return_typed_empty_tables():
    empty_turns = _tbl(
        conv_id=pa.array([], type=pa.string()),
        turn_idx=pa.array([], type=pa.int64()),
        role=pa.array([], type=pa.string()),
        tool=pa.array([], type=pa.string()),
        ts=pa.array([], type=pa.timestamp("us")),
        text=pa.array([], type=pa.string()),
    )
    assert _latency_block(empty_turns).num_rows == 0
    assert _context_growth_block(empty_turns).num_rows == 0
    assert _truncate_block(empty_turns, budget=8).num_rows == 0
    assert _burst_block(empty_turns).num_rows == 0
    assert _role_conv_partials(empty_turns).num_rows == 0
