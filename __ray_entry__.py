"""Driver contract for the pgweasel_ray engine.

``entry()`` runs the flagship parse → enrich → route → aggregate pipeline on
sf0.001. ``queries()`` exposes one callable per implemented operator
(SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent SQL. The
transcript input table (BASELINE.json input_hint shape) does not exist in
/root/testdata, so it is synthesised deterministically per sf
(pgweasel_ray/sources/transcripts.py) and BOTH sides — Ray and DuckDB —
read the identical parquet bytes; regex/needle fragments in the SQL are
generated from the same tables the kernels use (pgweasel_ray/oracle.py).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"  # the driver's correctness scale


def entry() -> Any:
    """Flagship: route (resumable partitioned sink) + broadcast-enriched
    severity counts on sf0.001."""
    from pgweasel_ray.pipelines import core, router

    router.route(SF001)
    return core.enriched_severity_counts(SF001)


def queries() -> dict[str, Callable[[str], Any]]:
    # DICT ORDER IS LOAD-BEARING (driver checks the FIRST 50 entries); the
    # ordered registry lives in pgweasel_ray/registry.py — single source of
    # truth shared with the CLI's generic `query` subcommand. Window policy
    # + the pinning test are documented there.
    from pgweasel_ray.registry import queries as _registry_queries

    return _registry_queries()


def oracle_sql() -> dict[str, str]:
    from pgweasel_ray.oracle_queries import build_oracles

    return build_oracles(SF_ORACLE)
