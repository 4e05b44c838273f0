"""Executed-shape probe: run a registry query (or all given) to the noop
sink and report what ACTUALLY executed — jobs, stages, total tasks, and
the post-AQE executed plan's Exchange / ReusedExchange / Join node counts.

Logical plans duplicate shared subtrees; AQE exchange reuse dedupes many
of them at runtime (the r20 vocab_drift lesson), so optimization claims
about duplication must be made against THESE numbers, not explain() text.

Usage: python tools/stage_probe.py [--out file.json] <query> [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def probe(spark, name, fn) -> dict:
    sc = spark.sparkContext
    group = f"probe_{name}_{time.time_ns()}"
    df = fn(spark, SF_DIR)
    sc.setJobGroup(group, name)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group) or []
    stage_ids, tasks = set(), 0
    for jid in job_ids:
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            if sid in stage_ids:
                continue
            stage_ids.add(sid)
            si = tracker.getStageInfo(sid)
            if si is not None:
                tasks += si.numTasks
    executed = df._jdf.queryExecution().executedPlan().toString()
    counts = {
        pat: len(re.findall(pat, executed))
        for pat in (
            "Exchange hashpartitioning", "BroadcastExchange",
            "ReusedExchange", "SortMergeJoin", "BroadcastHashJoin",
            "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
            "Window", "HashAggregate", "ObjectHashAggregate", "Sort ",
            "BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Generate",
        )
    }
    return {
        "query": name, "wall_sec": round(wall, 3),
        "jobs": len(job_ids), "stages": len(stage_ids), "tasks": tasks,
        "executed_counts": counts,
    }


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if args and args[0] == "--out":
        out_path = args[1]
        args = args[2:]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stage-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qf = entry.queries_full()
    results = [probe(spark, name, qf[name]) for name in args]
    for r in results:
        print(json.dumps(r))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
