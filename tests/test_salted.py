"""Salted-repartition aggregation: must equal the unsalted result exactly."""

from __future__ import annotations

from pgweasel_ray.pipelines.common import grouped_count, grouped_count_salted
from pgweasel_ray.sources.transcripts import read_transcripts


def test_salted_equals_unsalted(sf_dir):
    ds = read_transcripts(sf_dir, columns=["conv_id"])
    plain = (
        grouped_count(ds, ["conv_id"]).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    ds2 = read_transcripts(sf_dir, columns=["conv_id"])
    salted = (
        grouped_count_salted(ds2, ["conv_id"], salt=4).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    assert "_salt" not in salted.columns
    assert plain.equals(salted)
    # the hot convs (15% of turns each) are present and correct
    assert salted["cnt"].max() >= 0.10 * salted["cnt"].sum()
