"""Capture .explain('formatted') for registry queries to plans/<dir>/.

Usage: python tools/capture_plan.py <out_dir> <suffix> <query> [query ...]

Writes plans/<out_dir>/<query>_<suffix>.txt containing the formatted
physical plan of the query's returned DataFrame at sf0.01, plus (header
lines) the Spark job count consumed by BUILDING the frame (driver-side
probe loops show up here, not in the plan) and the wall time of build +
one noop-sink materialization.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", out_dir)
    os.makedirs(dest, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", 8)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qf = entry.queries_full()
    for name in names:
        fn = qf[name]
        tracker = spark.sparkContext.statusTracker()
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t_build = time.time() - t0
        j1 = len(spark.sparkContext.statusTracker()
                  .getJobIdsForGroup(None) or [])
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_run = time.time() - t0
        j2 = len(spark.sparkContext.statusTracker()
                  .getJobIdsForGroup(None) or [])
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- query: {name}  sf_dir: {SF_DIR}\n")
            f.write(f"-- build: {t_build:.3f}s, {j1 - j0} Spark jobs "
                    f"(driver-side probe loops land here)\n")
            f.write(f"-- noop materialization: {t_run:.3f}s, "
                    f"{j2 - j1} Spark jobs\n\n")
            f.write(plan)
        print(f"wrote {path}  build={t_build:.2f}s/{j1 - j0}j "
              f"run={t_run:.2f}s/{j2 - j1}j")


if __name__ == "__main__":
    main()
