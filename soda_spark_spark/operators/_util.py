"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-heavy map stage.

    Small corpora often arrive as 1-3 parquet partitions (row-group bound),
    which serializes hashing/shingling/scoring stages; the repartition shuffle
    of a small input is trivially cheap next to that. A wide input (>= half
    the default parallelism) is returned untouched — at 100TB the extra full
    shuffle would dominate, and the scan is already parallel.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
