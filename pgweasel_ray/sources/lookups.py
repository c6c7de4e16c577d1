"""Small broadcast side tables (role→tenant, tool→subsystem).

Loaded once on the driver (they are ≤ dozens of rows — FIXTURES.md §3),
``ray.put`` once, read inside each enrich actor's ``__init__``. Never
re-shipped per batch, never shuffled.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from .transcripts import ensure_fixture, lookup_path


def load_map(sf_dir: str | Path, which: str) -> dict[str, str]:
    ensure_fixture(sf_dir)
    t = pq.read_table(lookup_path(sf_dir, which))
    keys, values = t.column(0).to_pylist(), t.column(1).to_pylist()
    return dict(zip(keys, values))
