"""Deterministic sampling operators for training-data curation.

`df.sample()` is seed-stable only for a fixed partitioning — repartition the
input and the sample changes. These operators key the decision on a HASH OF
ROW CONTENT instead, so the same row is always in or out regardless of
partitioning, cluster size, or engine — the property a reproducible data
pipeline needs (and what makes the DuckDB oracle able to replay the sample).

All decisions are narrow per-row expressions (no shuffle); stratified
caps add one window per stratum key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DENOM = 1_000_000


def _uniform(key: Column, seed: int, hash_fn: str) -> Column:
    """Deterministic pseudo-uniform in [0, 1_000_000) from a key column."""
    if hash_fn == "md5":
        # md5 of the stringified key: replayable in any engine with md5
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", key.cast("string"), F.lit(seed))), 1, 15),
            16,
            10,
        ).cast("long")
    elif hash_fn == "xxhash64":
        h = F.xxhash64(key, F.lit(seed))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return F.pmod(h, F.lit(_DENOM))


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    *,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep ~`fraction` of rows, decided by hash(key) — reproducible across
    runs, partitionings, and engines. A row's fate depends only on its key,
    so adding/removing other rows never flips it (stable incremental
    sampling). hash_fn='md5' is the oracle-replayable configuration."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = int(fraction * _DENOM)
    return df.filter(_uniform(F.col(key_col), seed, hash_fn) < cut)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    *,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split for training pipelines: assign every row
    to exactly one named split (e.g. train/val/test) by hash(key) range.

    Properties a 100 TB training corpus needs:
    - partition/cluster/engine-invariant (content-hash ranges, not rand());
    - a row's split depends only on its key — re-running on a grown corpus
      never moves an existing row between splits (no train/test leakage
      across snapshots);
    - a narrow per-row projection: no shuffle, no sampling pass.

    `weights` maps split name -> nonnegative weight (normalized internally;
    the LAST split absorbs rounding, so the ranges exactly tile the hash
    domain). Returns the input plus `split_col`. hash_fn='md5' is the
    oracle-replayable configuration.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be nonnegative with a positive sum")
    total = float(sum(weights.values()))
    names = list(weights)
    # cumulative integer cut points over [0, _DENOM); last split absorbs
    # rounding so every hash value maps to exactly one split
    cuts: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        cuts.append(int(acc * _DENOM))
    u = _uniform(F.col(key_col), seed, hash_fn)
    expr = None
    for name, cut in zip(names[:-1], cuts):
        branch = (F.when(u < cut, F.lit(name)) if expr is None
                  else expr.when(u < cut, F.lit(name)))
        expr = branch
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_cols: list[str],
    cap_per_stratum: int,
    *,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """At most `cap_per_stratum` rows per stratum, chosen deterministically:
    rank rows inside each stratum by (hash(key), key) and keep the first
    `cap` — a content-keyed reservoir. One shuffle on the strata columns.

    For heavily skewed strata the shuffle key is the strata tuple; the
    window sort is per-stratum. Caps bound the OUTPUT, and ranking avoids
    collecting anything to the driver.
    """
    u = _uniform(F.col(key_col), seed, hash_fn)
    w = Window.partitionBy(*strata_cols).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= cap_per_stratum)
        .drop("__rank")
    )
