"""Property-based tests: engine metrics vs independent pure-Python
computation on random data (hypothesis). Complements the DuckDB oracle with
randomized coverage of edge shapes (nulls everywhere, constants, negatives).
"""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from soda_spark_spark import execute

values = st.lists(
    st.one_of(
        st.none(),
        st.integers(min_value=-10_000, max_value=10_000),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=values)
def test_numeric_metrics_match_python(spark, data):
    df = spark.createDataFrame([(v,) for v in data], "v long")
    r = execute(
        {"table_name": "t",
         "metrics": ["row_count", "missing_count", "values_count",
                     "min", "max", "avg", "sum", "variance", "stddev"]},
        df,
    )
    present = [v for v in data if v is not None]
    assert r.metric_value("row_count") == len(data)
    assert r.metric_value("missing_count", "v") == data.count(None)
    assert r.metric_value("values_count", "v") == len(present)
    if present:
        assert r.metric_value("min", "v") == min(present)
        assert r.metric_value("max", "v") == max(present)
        assert r.metric_value("sum", "v") == sum(present)
        assert r.metric_value("avg", "v") == pytest.approx(sum(present) / len(present))
    else:
        assert r.metric_value("min", "v") is None
        assert r.metric_value("sum", "v") is None
    if len(present) > 1:
        mean = sum(present) / len(present)
        var = sum((x - mean) ** 2 for x in present) / (len(present) - 1)
        assert r.metric_value("variance", "v") == pytest.approx(var, abs=1e-6)
        assert r.metric_value("stddev", "v") == pytest.approx(math.sqrt(var), abs=1e-6)
    else:
        assert r.metric_value("variance", "v") is None


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.lists(
    st.one_of(st.none(), st.sampled_from(["a", "bb", "ccc", "dddd", ""])),
    min_size=1, max_size=30,
))
def test_text_and_group_metrics_match_python(spark, data):
    df = spark.createDataFrame([(v,) for v in data], "v string")
    r = execute(
        {"table_name": "t",
         "metrics": ["min_length", "max_length", "avg_length"],
         "metric_groups": ["duplicates"]},
        df,
    )
    present = [v for v in data if v is not None]
    if present:
        lens = [len(v) for v in present]
        assert r.metric_value("min_length", "v") == min(lens)
        assert r.metric_value("max_length", "v") == max(lens)
        assert r.metric_value("avg_length", "v") == pytest.approx(sum(lens) / len(lens))
        counts = {v: present.count(v) for v in set(present)}
        assert r.metric_value("distinct", "v") == len(counts)
        assert r.metric_value("unique_count", "v") == sum(1 for c in counts.values() if c == 1)
        assert r.metric_value("duplicate_count", "v") == sum(1 for c in counts.values() if c > 1)
