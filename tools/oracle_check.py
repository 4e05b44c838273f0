"""Local replica of the driver's DuckDB-oracle correctness check.

Runs every `__spark_entry__.queries_full()` entry (the 50-query driver
registry PLUS the variants rotated out to fit the driver's 50-query cap)
against the matching `oracle_sql()` on the same parquet tables and compares
row count, sorted column names, and order-insensitive values (exact for
ints/strings/None, exact-first with a 1e-9 relative report for floats).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
With --json PATH, also writes a CORRECTNESS-shaped JSON artifact.
With --merge PATH, updates an existing artifact in place: entries for the
queries run this invocation are replaced, everything else is kept — the
way to re-certify ONLY newly registered queries while keeping the
committed full-registry artifact covering every `queries_full()` entry
(the `test_oracle_full_artifact_covers_registry` guard checks coverage).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if isinstance(v, float):
        return v
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if hasattr(v, "isoformat"):  # datetime/date
        return str(v)
    if isinstance(v, (int, str, bool)) or v is None:
        return v
    return str(v)


def compare_values(spark_rows, duck_rows):
    """Order-insensitive compare; returns (ok, detail)."""
    if len(spark_rows) != len(duck_rows):
        return False, f"row count {len(spark_rows)} vs {len(duck_rows)}"
    key = lambda r: tuple((x is None, str(x)) for x in r)  # noqa: E731
    s_sorted = sorted(spark_rows, key=key)
    d_sorted = sorted(duck_rows, key=key)
    float_diffs = 0
    max_rel = 0.0
    for sr, dr in zip(s_sorted, d_sorted):
        for a, b in zip(sr, dr):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                if a is None or b is None:
                    return False, f"null mismatch {a!r} vs {b!r}"
                # Driver parity: its value-hash stringifies cells, so
                # str(-0.0) != str(0.0) even though -0.0 == 0.0 here.
                if a == b == 0.0 and math.copysign(1.0, a) != math.copysign(1.0, b):
                    return False, f"signed-zero mismatch {a!r} vs {b!r}"
                if a != b:
                    if math.isnan(a) and math.isnan(b):
                        continue
                    rel = abs(a - b) / max(abs(a), abs(b), 1e-300)
                    float_diffs += 1
                    max_rel = max(max_rel, rel)
                    if rel > 1e-9:
                        return False, f"float mismatch {a!r} vs {b!r} rel={rel:.2e}"
            elif a != b:
                return False, f"value mismatch {a!r} vs {b!r}"
    if float_diffs:
        return True, f"OK-ish: {float_diffs} float cells differ (max rel {max_rel:.2e})"
    return True, "exact"


# Driver-safe output types (round 20, the r19 verdict's structural
# ask): the driver's value-hash STRINGIFIES cells, so any type whose
# string rendering is session- or engine-dependent (timestamps render
# in the session timezone, decimals scale-render differently across
# engines, binary has no canonical text form, dates only LOOK safe
# until an engine localizes them) is banned from registry outputs.
# Typed surfaces stay pinned in pytest where the session is
# controlled; registry rows project to these primitives.
DRIVER_SAFE_TYPES = {
    "bigint", "int", "smallint", "tinyint", "double", "float",
    "string", "boolean",
}


def unsafe_output_fields(schema) -> list[tuple[str, str]]:
    """[(column, type)] for every field of a Spark schema whose type
    is outside DRIVER_SAFE_TYPES — the structural guard that turns
    the r17 signed-zero / r19 timestamp incident class into a
    certification failure instead of a driver surprise."""
    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if f.dataType.simpleString() not in DRIVER_SAFE_TYPES
    ]


def main() -> int:
    args = list(sys.argv[1:])
    json_path = None
    merge_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    if "--merge" in args:
        i = args.index("--merge")
        merge_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries_full() if hasattr(entry, "queries_full") else entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            bad_fields = unsafe_output_fields(sdf.schema)
            if bad_fields:
                failures.append(name)
                report[name] = {
                    "err": f"driver-unsafe output types: {bad_fields}"
                }
                print(f"FAIL {name}: driver-unsafe output types: "
                      f"{bad_fields}")
                continue
            spark_cols = sorted(sdf.columns)
            spark_rows = [tuple(norm_cell(v) for v in row) for row in sdf
                          .select(*spark_cols).collect()]
        except Exception as exc:
            failures.append(name)
            report[name] = {"err": str(exc)[:300]}
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            report[name] = {"rows_only": True, "spark_rows": len(spark_rows),
                            "err": None}
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = sorted(d[0] for d in res.description)
            duck_all = res.fetchall()
        except Exception as exc:
            failures.append(name)
            report[name] = {"err": f"duckdb: {str(exc)[:300]}"}
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        if spark_cols != duck_cols:
            failures.append(name)
            report[name] = {"schema_match": False,
                            "err": f"columns {spark_cols} vs {duck_cols}"}
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            continue
        # re-order duck columns to the sorted order
        order = [i for i, _ in sorted(enumerate(d[0] for d in res.description),
                                      key=lambda p: p[1])]
        duck_rows = [tuple(norm_cell(r[i]) for i in order) for r in duck_all]
        ok, detail = compare_values(spark_rows, duck_rows)
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        report[name] = {
            "rows_match": len(spark_rows) == len(duck_rows),
            "schema_match": True,
            "values_match": ok,
            "detail": detail,
            "spark_rows": len(spark_rows),
            "oracle_rows": len(duck_rows),
            "err": None if ok else detail,
        }
        print(f"{status} {name}: {len(spark_rows)} rows, {detail}  ({time.time()-t0:.1f}s)")

    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_path}")
    if merge_path:
        import json

        with open(merge_path) as f:
            merged = json.load(f)
        merged.update(report)
        # drop entries for queries no longer in the registry
        merged = {k: v for k, v in merged.items() if k in qs}
        with open(merge_path, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"merged {len(report)} entries into {merge_path} "
              f"({len(merged)} total)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
