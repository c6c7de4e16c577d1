"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side, compare row-count + schema + order-
insensitive values. Usage: python scripts/check_correctness.py [sf_dir]."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> str:
    a, b = normalize(ray_df), normalize(ora_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
            close = np.allclose(av.astype(float), bv.astype(float),
                                rtol=1e-12, equal_nan=True)
            if not ok:
                return (f"VALUE MISMATCH col={c} (exact)"
                        + (" [within 1e-12]" if close else " [REAL]"))
        else:
            eq = pd.Series(av).fillna("\x00") == pd.Series(bv).fillna("\x00")
            if not eq.all():
                i = int(np.nonzero(~eq.to_numpy())[0][0])
                return (f"VALUE MISMATCH col={c} row {i}: "
                        f"ray={av[i]!r} oracle={bv[i]!r}")
    return "OK"


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(ray_df):7d} (rows-only, {wall:.1f}s)")
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, ora_df)
        status = "✓" if verdict == "OK" else "✗"
        print(f"{name:28s} {status} rows={len(ray_df):7d} ({wall:.1f}s) {verdict if verdict != 'OK' else ''}")
        if verdict != "OK":
            failures += 1
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    raise SystemExit(main(sf, only))
