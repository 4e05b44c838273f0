"""Regenerate docs/REGISTRY.md from the live query registry.

Usage: python tools/gen_registry.py [round_number]

Without an argument the round is stamped from the newest committed
ORACLE_FULL_r*.json artifact.
"""

from __future__ import annotations

import glob
import inspect
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def _latest_round() -> str:
    arts = sorted(glob.glob("/root/repo/ORACLE_FULL_r*.json"))
    if not arts:
        return "?"
    return re.search(r"r(\d+)\.json$", arts[-1]).group(1)


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else _latest_round()
    driver = set(entry.queries())
    full = entry.queries_full()
    lines = [
        f"# Certified query registry (round {rnd})",
        "",
        "Auto-generated map of every `queries_full()` entry to its implementation.",
        "`driver` = in the 50-row driver registry this round; all entries are",
        f"DuckDB-oracled and certified exact in `ORACLE_FULL_r{rnd.zfill(2) if rnd.isdigit() else rnd}.json` at sf0.01.",
        "",
        "| query | driver | implementation | summary |",
        "|---|---|---|---|",
    ]
    for name, fn in full.items():
        src_file = inspect.getsourcefile(fn).split("/")[-1]
        line_no = inspect.getsourcelines(fn)[1]
        doc = (inspect.getdoc(fn) or "").splitlines()
        summary = doc[0] if doc else ""
        d = "yes" if name in driver else "full-reg"
        lines.append(
            f"| `{name}` | {d} | `{src_file}:{line_no}` | {summary} |"
        )
    with open("/root/repo/docs/REGISTRY.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/REGISTRY.md: {len(full)} entries, {len(driver)} driver")


if __name__ == "__main__":
    main()
