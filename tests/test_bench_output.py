"""Pin the bench stdout contract (round-21 VERDICT item 1).

The driver that consumes bench.py keeps only a ~2000-char tail of stdout.
The r19 full-detail line exceeded it and came back unparseable
(BENCH_r19.json parsed: null), losing the whole round-over-round PERF
comparison. These tests pin the printed line to stay comfortably inside
that window and to keep the required driver keys, for every entry in the
real BENCHES registry at worst-case magnitudes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _worst_case_line() -> str:
    # every entry at a 3-digit-seconds median: wider than anything real
    timings = {name: 999.99 for name in bench.BENCHES}
    cal = {"numpy_sec": 99.999, "jvm_sec": 99.999, "total_sec": 199.998}
    return bench._compact_line(
        sum(timings.values()), timings, "0.1", "32", cal, cal
    )


def test_compact_line_fits_driver_tail():
    line = _worst_case_line()
    assert "\n" not in line
    assert len(line) < 1500, f"printed bench line is {len(line)} chars"


def test_compact_line_round_trips_with_driver_keys():
    parsed = json.loads(_worst_case_line())
    # the driver contract keys
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    assert parsed["metric"] == "headline_suite_wall_clock"
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.BENCHES)
    # the round-21 hardening keys
    assert parsed["cpus"] == 32
    assert parsed["calibration_suspect"] is True  # 199.998 s >> 0.6 s gate
    assert parsed["calibration_sec"] == 199.998
    assert parsed["calibration_end_sec"] == 199.998


def test_calibration_suspect_flag_honours_idle_gate():
    timings = {name: 1.0 for name in bench.BENCHES}
    idle = {"numpy_sec": 0.15, "jvm_sec": 0.25, "total_sec": 0.4}
    loaded = {"numpy_sec": 4.4, "jvm_sec": 4.6, "total_sec": 9.0}
    clean = json.loads(
        bench._compact_line(40.0, timings, "0.1", "8", idle, idle)
    )
    assert clean["calibration_suspect"] is False
    # the r20 failure mode: clean start, loaded end — must still flag
    drifted = json.loads(
        bench._compact_line(40.0, timings, "0.1", "8", idle, loaded)
    )
    assert drifted["calibration_suspect"] is True
