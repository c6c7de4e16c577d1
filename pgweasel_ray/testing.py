"""Result-comparison helpers shared by tests/ and scripts/check_correctness.py
— a local replica of the driver's gate: schema (column names sorted),
row count, and value equality.

The compare is ROW-ORDER-SENSITIVE by default (r4 lesson: the driver's
value hash is taken over rows as returned, so an order-insensitive local
✓ does not imply a driver ✓ — docs_pack_sequences failed exactly this
way). Order-sensitive equality is strictly stronger than any driver hash,
whether or not the driver canonicalizes row order, so local ✓ ⇒ driver ✓.
Every queries() entry must therefore return a DETERMINISTICALLY ORDERED
result and its oracle_sql() must carry a matching ORDER BY."""

from __future__ import annotations

import numpy as np
import pandas as pd


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.to_pandas()
    df = result.to_pandas()  # ray Dataset
    if df.empty and len(df.columns) == 0:
        # Ray's to_pandas() drops the schema for 0-row datasets; rebuild
        # the typed empty frame so an empty result still schema-compares
        # (found by the random-events differential: a random table with
        # zero anomalous buckets reported SCHEMA MISMATCH ray=[]). A
        # dataset whose every block was pruned (e.g. a sort over an
        # all-filtered stream) has NO schema at all — nothing to rebuild.
        schema = result.schema()
        if schema is None:
            return df
        empty = pa.schema(
            list(zip(schema.names, schema.types))
        ).empty_table()
        return empty.to_pandas()
    return df


def normalize(df: pd.DataFrame, sort_rows: bool = True) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    if sort_rows:
        df = df.sort_values(list(df.columns))
    return df.reset_index(drop=True)


def compare(ray_df: pd.DataFrame, ora_df: pd.DataFrame,
            ordered: bool = True) -> str:
    """Returns "OK" or a mismatch description. With ordered=True (default)
    rows are compared AS RETURNED; an order-only divergence reports
    "ROW ORDER MISMATCH" so the fix (a deterministic sort on both sides)
    is obvious. ordered=False restores the legacy order-insensitive check
    for results whose order is inherently unstable on both sides."""
    if ordered:
        verdict = _compare_frames(normalize(ray_df, sort_rows=False),
                                  normalize(ora_df, sort_rows=False))
        if verdict != "OK" and verdict.startswith("VALUE MISMATCH"):
            if _compare_frames(normalize(ray_df), normalize(ora_df)) == "OK":
                return f"ROW ORDER MISMATCH (values match unordered): {verdict}"
        return verdict
    return _compare_frames(normalize(ray_df), normalize(ora_df))


def _compare_frames(a: pd.DataFrame, b: pd.DataFrame) -> str:
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
