"""Result-comparison helpers shared by tests/ and scripts/check_correctness.py
— a local replica of the driver's gate: schema (column names sorted),
row count, and order-insensitive value equality."""

from __future__ import annotations

import numpy as np
import pandas as pd


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> str:
    """Returns "OK" or a mismatch description."""
    a, b = normalize(ray_df), normalize(ora_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            if not np.allclose(av, bv, rtol=0, atol=0, equal_nan=True):
                within = np.allclose(av.astype(float), bv.astype(float),
                                     rtol=1e-12, equal_nan=True)
                return (f"VALUE MISMATCH col={c} (exact float)"
                        + (" [within 1e-12]" if within else " [REAL]"))
        else:
            eq = pd.Series(av).fillna("\x00") == pd.Series(bv).fillna("\x00")
            if not eq.all():
                i = int(np.nonzero(~eq.to_numpy())[0][0])
                return (f"VALUE MISMATCH col={c} row {i}: "
                        f"ray={av[i]!r} oracle={bv[i]!r}")
    return "OK"


def duckdb_with_views(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con
