"""Single-pass curation funnel (`pipeline.gate_funnel`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.pipeline import curate, gate_funnel


STEPS = [
    {"kind": "length_filter", "min_chars": 12},
    {"kind": "pii_filter", "max_email_count": 0},
]


def _docs(spark):
    rows = [
        (1, "s1", "a short"),                              # fails length
        (2, "s1", "long enough text with no pii here"),
        (3, "s1", "long enough but mail me at a@b.com ok"),  # fails pii
        (4, "s2", "another long clean document body"),
        (5, "s2", "tiny"),                                 # fails length
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_funnel_counts_are_cumulative(spark):
    out = {r.stage: r for r in gate_funnel(_docs(spark), STEPS).collect()}
    assert (out[1].kind, out[1].n_in, out[1].n_out) == ("length_filter", 5, 3)
    assert (out[2].kind, out[2].n_in, out[2].n_out) == ("pii_filter", 3, 2)
    assert out[1].n_dropped == 2 and out[2].n_dropped == 1


def test_funnel_matches_curate_survivors(spark):
    docs = _docs(spark)
    funnel = sorted(gate_funnel(docs, STEPS).collect(), key=lambda r: r.stage)
    survivors, _ = curate(docs, STEPS)
    assert funnel[-1].n_out == survivors.count()


def test_funnel_grouped(spark):
    rows = {(r.source, r.stage): r for r in gate_funnel(
        _docs(spark), STEPS, group_by="source"
    ).collect()}
    assert rows[("s1", 1)].n_in == 3 and rows[("s1", 1)].n_out == 2
    assert rows[("s1", 2)].n_out == 1
    assert rows[("s2", 1)].n_in == 2 and rows[("s2", 2)].n_out == 1


def test_funnel_single_job_plan(spark):
    """The whole funnel is ONE aggregation — no joins, one exchange
    pair (partial + final)."""
    plan = gate_funnel(_docs(spark), STEPS)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan


def test_funnel_validates(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        gate_funnel(docs, [])
    with pytest.raises(ValueError, match="not a pure-projection"):
        gate_funnel(docs, [{"kind": "near_dedup"}])
    with pytest.raises(ValueError, match="keep-set"):
        gate_funnel(
            docs, [{"kind": "repetition_filter", "max_top_bigram_fraction": 0.5}]
        )
    with pytest.raises(ValueError, match="unknown kwargs"):
        gate_funnel(docs, [{"kind": "length_filter", "min_charz": 3}])
