"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side, compare row-count + schema + order-
insensitive values. Usage: python scripts/check_correctness.py [sf_dir] [names...]

NOTE: oracle_sql() is pinned to sf0.01, so transcript queries only line up
when run at /root/testdata/sf0.01.
"""

from __future__ import annotations

import sys
import time


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
    from pgweasel_ray.testing import compare, duckdb_with_views, to_df

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_with_views(sf_dir)

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
        verdict = compare(ray_df, ora_df)
        status = "✓" if verdict == "OK" else "✗"
        print(f"{name:28s} {status} rows={len(ray_df):7d} ({wall:.1f}s) "
              f"{verdict if verdict != 'OK' else ''}")
        if verdict != "OK":
            failures += 1
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    raise SystemExit(main(sf, only))
