"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_step(
    df: DataFrame, checkpoint_dir: str | None = None
) -> DataFrame:
    """Materialize an iterative superstep AND truncate its lineage.

    The iterative operators (pagerank supersteps, connected-components
    rounds, deep `curate(checkpoint_every=)` chains) must cut lineage
    each round or both execution and Catalyst analysis double per
    iteration. Two ways to cut it, chosen by `checkpoint_dir`:

    - None (default): `localCheckpoint(eager=True)` — blocks live in
      EXECUTOR-LOCAL storage. Fastest, zero configuration, and
      unconditionally correct on a healthy cluster (and on local[N]) —
      but an executor loss destroys its checkpoint blocks AND the
      already-truncated lineage, so a multi-hour 100-TB job dies
      unrecoverably. Use for local runs and short jobs.
    - a path (HDFS/S3/local dir): RELIABLE `df.checkpoint(eager=True)`
      against that directory — survives executor loss at the cost of a
      write+read round-trip per materialization. Use for long
      iterative jobs on real clusters. The SparkContext checkpoint dir
      is set on first use (per-context memo — `setCheckpointDir`
      mints a fresh UUID subdirectory per call, so repeated calls with
      the same path must not re-set it). Reliable checkpoint files
      are reclaimed by the ContextCleaner only when
      `spark.cleaner.referenceTracking.cleanCheckpoints=true`;
      otherwise clean the directory after the job.

    Both modes return bit-identical data (pytest-pinned for pagerank
    and connected components): checkpointing changes WHERE the
    materialized partitions live, never their contents.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if getattr(sc, "_soda_spark_checkpoint_dir", None) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        sc._soda_spark_checkpoint_dir = checkpoint_dir
    return df.checkpoint(eager=True)


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
