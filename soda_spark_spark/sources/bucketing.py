"""Bucketed-table support: the shuffle-elimination lever for repeated joins.

At 100 TB, a fact-to-fact equi-join shuffles both sides every query. Writing
both tables bucketed (and sorted) on the join key makes the join's exchanges
disappear: Spark reads co-located buckets and sort-merge-joins them in place.
One write-time shuffle amortizes over every subsequent join/aggregation on
the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str] | str,
    num_buckets: int,
    sort_by: list[str] | str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save `df` as a bucketed (optionally sorted) managed table. Joins and
    aggregations keyed on `bucket_by` against tables with the SAME bucket
    count then run shuffle-free (verify with `.explain` — no Exchange above
    the scans)."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
