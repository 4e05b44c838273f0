"""Z-order layout keys (`packing.zorder_key` / `packing.apply_zorder`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.packing import apply_zorder, zorder_key


def _morton(vals: list[int], bits: int) -> int:
    n = len(vals)
    k = 0
    for ci, v in enumerate(vals):
        for bi in range(bits):
            k |= ((v >> bi) & 1) << (bi * n + ci)
    return k


def test_matches_reference_morton_2d(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x int, y int"
    )
    out = zorder_key(df, ["x", "y"], bits=3)
    for r in out.collect():
        assert r.zorder_key == _morton([r.x, r.y], 3), (r.x, r.y)


def test_matches_reference_morton_3d(spark):
    df = spark.createDataFrame(
        [(x, y, z) for x in range(4) for y in range(4) for z in range(4)],
        "x int, y int, z int",
    )
    out = zorder_key(df, ["x", "y", "z"], bits=2)
    for r in out.collect():
        assert r.zorder_key == _morton([r.x, r.y, r.z], 2)


def test_grid_rescales_by_min_max(spark):
    # values 100..107 grid exactly like 0..7 (min/max normalization)
    df = spark.createDataFrame(
        [(100 + x, 100 + y) for x in range(8) for y in range(8)],
        "x long, y long",
    )
    out = zorder_key(df, ["x", "y"], bits=3)
    for r in out.collect():
        assert r.zorder_key == _morton([r.x - 100, r.y - 100], 3)


def test_null_coordinate_yields_null_key(spark):
    df = spark.createDataFrame(
        [(1, 1), (None, 2), (3, None)], "x int, y int"
    )
    out = zorder_key(df, ["x", "y"], bits=4)
    got = {(r.x, r.y): r.zorder_key for r in out.collect()}
    assert got[(None, 2)] is None and got[(3, None)] is None
    assert got[(1, 1)] is not None


def test_pinned_stats_clamp_and_stability(spark):
    df = spark.createDataFrame([(0,), (5,), (99,)], "x int")
    out = zorder_key(df, ["x"], bits=3, stats={"x": (0, 7)})
    got = {r.x: r.zorder_key for r in out.collect()}
    assert got[0] == 0 and got[5] == 5
    assert got[99] == 7  # clamped to the edge bucket
    # pinned grid: adding rows never moves existing keys
    df2 = spark.createDataFrame([(0,), (5,), (99,), (1000,)], "x int")
    got2 = {r.x: r.zorder_key for r in
            zorder_key(df2, ["x"], bits=3, stats={"x": (0, 7)}).collect()}
    assert all(got2[k] == v for k, v in got.items())


def test_constant_column_single_bucket(spark):
    df = spark.createDataFrame([(7, 1), (7, 2)], "x int, y int")
    out = zorder_key(df, ["x", "y"], bits=4)
    # x is constant: its bits contribute 0; keys differ only by y
    got = sorted(r.zorder_key for r in out.collect())
    assert got[0] == 0  # y=1 -> bucket 0 -> key 0


def test_validation(spark):
    df = spark.createDataFrame([(1, "a", 1.5)], "x int, s string, d double")
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="integral"):
        zorder_key(df, ["s"])
    with pytest.raises(ValueError, match="integral"):
        zorder_key(df, ["d"])
    with pytest.raises(ValueError, match="bits"):
        zorder_key(df, ["x"], bits=63)
    with pytest.raises(ValueError, match="stats missing"):
        zorder_key(df, ["x"], stats={})


def test_apply_zorder_clusters_files(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = apply_zorder(df, ["x", "y"], num_partitions=4, bits=4)
    assert out.columns == ["x", "y"]  # key dropped
    # each output partition covers a CONTIGUOUS, disjoint key range
    # (range partitioning), so per-file x/y envelopes shrink
    keyed = zorder_key(df, ["x", "y"], bits=4)
    parts = (
        keyed.repartitionByRange(4, F.col("zorder_key"))
        .sortWithinPartitions("zorder_key")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zorder_key").alias("lo"), F.max("zorder_key").alias("hi"),
             F.count("*").alias("n"))
        .collect()
    )
    spans = sorted((p.lo, p.hi) for p in parts)
    assert sum(p.n for p in parts) == 256
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint, ordered ranges


def test_zone_map_stats_and_envelope_shrink(spark):
    from soda_spark_spark.operators.packing import zone_map, zorder_key

    rows = [(x, y, None if (x + y) % 9 == 0 else float(x * y))
            for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int, v double")
    # un-clustered zones: hash-ish split -> wide x envelopes
    wide = zone_map(df.withColumn("z", (F.col("y") % 4)), ["z"], ["x", "v"])
    # z-ordered zones: key-range split -> tight x envelopes
    keyed = zorder_key(df, ["x", "y"], bits=4).withColumn(
        "z", F.expr("zorder_key * 4 div 256")
    )
    tight = zone_map(keyed, ["z"], ["x", "v"])
    assert wide.count() == 4 and tight.count() == 4
    span = lambda r: r.x_max - r.x_min  # noqa: E731
    assert sum(span(r) for r in tight.collect()) < sum(
        span(r) for r in wide.collect()
    )
    got = {r.z: r for r in tight.collect()}
    assert sum(r.n for r in got.values()) == 256
    assert all(r.v_nulls > 0 for r in got.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zone column"):
        zone_map(df, [], ["x"])
    with _pytest.raises(ValueError, match="stats column"):
        zone_map(df, ["x"], [])
