"""Table sources: load the driver-provided parquet tables and register views.

The reference takes "whatever DataFrame the caller hands in"
(/root/reference/src/sodaspark/scan.py:441-442); this module adds the
convenience layer for the benchmark/oracle tables in /root/testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

from .io import (  # noqa: E402,F401
    compact_files,
    read_source,
    read_stream_source,
    write_sink,
)
