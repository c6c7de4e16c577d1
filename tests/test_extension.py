"""The user-extension surface: custom Predicate + Aggregation composed like
the reference's Filter/Aggregator traits (SURVEY §2.6)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

from pgweasel_ray.extension import (
    GroupedCount, MinSeverity, RegexPredicate, run,
)
from pgweasel_ray.sources.transcripts import transcripts_glob


def test_custom_predicate_chain(sf_dir):
    ds = run(
        sf_dir,
        predicates=[MinSeverity(8), RegexPredicate(r'user "mallory"')],
    )
    df = ds.to_pandas()
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{transcripts_glob(sf_dir)}')
            WHERE regexp_matches(text, 'user "mallory"')
              AND contains(text, 'FATAL:')"""
    ).fetchone()[0]
    assert len(df) == want
    assert df["text"].str.contains("mallory").all()


def test_custom_aggregation(sf_dir):
    out = run(
        sf_dir,
        predicates=[MinSeverity(8)],
        aggregation=GroupedCount("severity", groups=("severity",)),
    ).to_pandas()
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{transcripts_glob(sf_dir)}')
            WHERE contains(text, 'ERROR:') AND NOT contains(text, 'LOG:')"""
    ).fetchone()[0]
    got = dict(zip(out["severity"], out["cnt"]))
    assert got["error"] == want


class EveryOtherTurn:
    """A genuinely custom user predicate (no built-in equivalent)."""

    groups: tuple[str, ...] = ()

    def mask(self, batch: pa.Table) -> pa.Array:
        return pc.equal(pc.bit_wise_and(batch["turn_idx"], 1), 0)


def test_fully_custom_predicate(sf_dir):
    df = run(sf_dir, predicates=[EveryOtherTurn()]).to_pandas()
    assert (df["turn_idx"] % 2 == 0).all()
    assert len(df) > 0
