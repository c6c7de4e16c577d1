"""Differential fuzzing: arbitrary generated record text must produce
IDENTICAL results from the pyarrow kernels and the DuckDB oracle fragments
(both RE2) — the parity claim tested adversarially, not just on fixtures.

Strategy mixes random unicode with fragments that exercise the tricky paths
(severity needles in odd positions, duration edge units, kv terminators,
multi-line records). Derandomized so CI is stable."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from pgweasel_ray import kernels, oracle

FRAGMENTS = st.sampled_from([
    "LOG:", "ERROR:", "INFO:", "DEBUG5:", "FATAL:", "PANIC:", "error:",
    ": ", ":  ", ":", "\n", " ",
    "duration:", "duration: 12", "duration: 1.5 ms", "duration: 2 s",
    "duration: 3 min", "duration: . us", "duration: 1.2.3 ms",
    "host=", "user=", "database=", "application_name=", "user=,", 'user="',
    "h=1.2.3.4", ",", '"',
    "deadlock detected", "process 12 acquired", "process acquired",
    " still waiting for ", "autovacuum", "wal", "shut down",
    "connection received:", "connection authorized:", "SSL enabled",
    "password authentication failed", "is not permitted to log in",
    "(23503)", "(ABCDE)", "(abc)",
    "péché", "日本語テキスト",
])

texts_strategy = st.lists(
    st.lists(
        st.one_of(FRAGMENTS, st.text(max_size=12)), min_size=0, max_size=8
    ).map("".join),
    min_size=1,
    max_size=40,
)


def _oracle_df(texts: list[str], select: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": texts}))
    return con.sql(f"SELECT {select} FROM t").df()


def _norm(values):
    return [None if pd.isna(v) else v for v in values]


@settings(max_examples=60, deadline=None, derandomize=True)
@given(texts_strategy)
def test_severity_parity(texts):
    arr = pa.array(texts, type=pa.string())
    name, rank = kernels.severity_columns(arr)
    ora = _oracle_df(
        texts, f"{oracle.severity_case()} AS s, {oracle.rank_case()} AS r"
    )
    assert name.to_pylist() == list(ora["s"])
    assert rank.to_pylist() == [int(x) for x in ora["r"]]


@settings(max_examples=60, deadline=None, derandomize=True)
@given(texts_strategy)
def test_message_parity(texts):
    arr = pa.array(texts, type=pa.string())
    got = kernels.message_column(arr).to_pylist()
    ora = _norm(_oracle_df(texts, f"{oracle.message_expr()} AS m")["m"])
    assert got == ora


@settings(max_examples=60, deadline=None, derandomize=True)
@given(texts_strategy)
def test_duration_parity(texts):
    arr = pa.array(texts, type=pa.string())
    got = kernels.duration_ms_column(arr).to_pylist()
    ora = _norm(_oracle_df(texts, f"{oracle.duration_ms_expr()} AS d")["d"])
    assert got == ora  # exact float equality — same formula on both sides


@settings(max_examples=40, deadline=None, derandomize=True)
@given(texts_strategy)
def test_kv_parity(texts):
    arr = pa.array(texts, type=pa.string())
    for field in ("host", "user", "db", "appname"):
        got = kernels.kv_column(arr, field).to_pylist()
        ora = _norm(_oracle_df(texts, f"{oracle.kv_expr(field)} AS v")["v"])
        assert got == ora, field


@settings(max_examples=40, deadline=None, derandomize=True)
@given(texts_strategy)
def test_filter_parity(texts):
    arr = pa.array(texts, type=pa.string())
    got_l = kernels.locking_mask(arr).to_pylist()
    got_s = kernels.system_mask(arr).to_pylist()
    ora = _oracle_df(
        texts, f"{oracle.lock_expr()} AS l, {oracle.system_expr()} AS s"
    )
    assert got_l == list(ora["l"])
    assert got_s == list(ora["s"])


@given(st.lists(st.floats(min_value=0.0, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_float_floor_quantization_parity(values):
    """The linfit/corr y-quantization floor(value·100) must agree
    bit-for-bit between numpy and DuckDB on arbitrary doubles (both are
    IEEE double multiply + floor; a divergence would silently break the
    sufficient-statistics oracles)."""
    import numpy as np

    from pgweasel_ray.pipelines.events import LINFIT_Y_SCALE

    np_y = np.floor(
        np.array(values, dtype=np.float64) * LINFIT_Y_SCALE
    ).astype(np.int64)
    con = duckdb.connect()
    df = pd.DataFrame({"v": pd.array(values, dtype="float64")})
    con.register("t", df)
    duck_y = con.sql(
        f"SELECT floor(v * {LINFIT_Y_SCALE})::BIGINT AS y FROM t"
    ).df()["y"].to_numpy()
    assert (np_y == duck_y).all()


@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=40, deadline=None)
def test_sqrt_and_division_parity(dx):
    """sqrt + the corr float expression tree must match DuckDB exactly
    (IEEE correctly-rounded sqrt on both engines)."""
    import math

    num = 3 * dx + 1
    dy = 2 * dx + 7
    py = float(num) / (math.sqrt(float(dx or 1)) * math.sqrt(float(dy)))
    got = duckdb.sql(
        f"SELECT {num}::HUGEINT::DOUBLE / (sqrt(({dx or 1})::HUGEINT::DOUBLE)"
        f" * sqrt({dy}::HUGEINT::DOUBLE)) AS r"
    ).fetchone()[0]
    assert py == got
