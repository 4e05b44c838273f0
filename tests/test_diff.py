"""Snapshot-diff operators: keyed table version auditing."""

from __future__ import annotations

import pytest

from soda_spark_spark.operators.diff import snapshot_diff, snapshot_diff_summary


@pytest.fixture()
def snaps(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "B", 20.0),    # changed (s)
            (3, "c", 30.0),    # changed (v: NULL -> 30, null-safe)
            (5, "e", 50.0),    # added
        ],                      # 4 removed
        "k long, s string, v double",
    )
    return old, new


def test_snapshot_diff_statuses(spark, snaps):
    old, new = snaps
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "unchanged", 2: "changed", 3: "changed", 4: "removed", 5: "added",
    }


def test_snapshot_diff_summary_column_attribution(spark, snaps):
    old, new = snaps
    row = snapshot_diff_summary(old, new, ["k"]).first()
    assert (row["added"], row["removed"], row["changed"], row["unchanged"]) == (
        1, 1, 2, 1,
    )
    assert row["changed_s"] == 1  # only key 2 changed s
    assert row["changed_v"] == 1  # only key 3 changed v (NULL -> 30)


def test_snapshot_diff_requires_shared_columns(spark):
    a = spark.createDataFrame([(1, "x")], "k long, a string")
    b = spark.createDataFrame([(1, "y")], "k long, b string")
    with pytest.raises(ValueError, match="no shared non-key columns"):
        snapshot_diff(a, b, ["k"])
