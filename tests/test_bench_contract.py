"""The bench's driver-facing output contract (round 16).

The driver parses the LAST JSON line bench.py prints and compares its
``queries`` dict round-over-round. r15's PERF could only compare one
synthetic "total" key; r16 restored per-query resolution. These tests
pin the contract without running the (20-minute) bench itself.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_final_line_carries_per_query_mins_and_total():
    timings = {"q_a": 1.5, "q_b": 0.25}
    line = bench.final_line(timings, 1.75, 0.1, "BENCH_DETAIL_r16.json")
    parsed = json.loads(line)
    # additions only: every per-query key present, legacy total kept
    assert parsed["queries"]["q_a"] == 1.5
    assert parsed["queries"]["q_b"] == 0.25
    assert parsed["queries"]["total"] == 1.75
    assert parsed["value"] == 1.75
    assert parsed["n_queries"] == 2
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["detail"] == "BENCH_DETAIL_r16.json"


def test_final_line_is_one_line_and_tail_sized():
    # 104 entries must survive the driver's tail capture: one line,
    # well under the ~8 KB the capture demonstrably keeps (BENCH_r15's
    # tail held >4 KB of an earlier line plus the full final line)
    timings = {f"q_{i:03d}_some_longer_name": round(i * 0.123, 3) for i in range(110)}
    line = bench.final_line(timings, 99.9, 0.1, "BENCH_DETAIL_r99.json")
    assert "\n" not in line
    assert len(line) < 8000
    assert json.loads(line)["queries"]["total"] == 99.9


def test_detail_filename_stamps_core_count_family(tmp_path):
    repo = str(tmp_path)
    # default cores: plain round stamp, then letter suffixes
    assert bench.detail_filename(repo, 16, "32") == "BENCH_DETAIL_r16.json"
    open(os.path.join(repo, "BENCH_DETAIL_r16.json"), "w").write("{}")
    assert bench.detail_filename(repo, 16, "32") == "BENCH_DETAIL_r16b.json"
    # non-default cores go to their own family and never collide with
    # the main lineage (the r15 8-core run stole BENCH_DETAIL_r16.json)
    assert bench.detail_filename(repo, 16, "8") == "BENCH_DETAIL_r16_c8.json"
    open(os.path.join(repo, "BENCH_DETAIL_r16_c8.json"), "w").write("{}")
    assert bench.detail_filename(repo, 16, "8") == "BENCH_DETAIL_r16b_c8.json"
