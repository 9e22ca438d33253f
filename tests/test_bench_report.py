"""The README paired-run block is machine-written from the committed
bench artifacts (tools/bench_report.py; VERDICT r6 #1). These tests pin
the mechanism — markers present, block buildable from the committed
artifacts, numbers internally consistent — without pinning freshness
(the round-end protocol runs ``--check`` after the paired run; a
freshness test here would go red the moment the driver re-runs bench.py
without regenerating the README).
"""

import json
import os
import re

from tools.bench_report import BEGIN, END, build_block

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_has_markers_once():
    text = open(os.path.join(REPO, "README.md")).read()
    assert text.count(BEGIN) == 1
    assert text.count(END) == 1
    assert text.find(BEGIN) < text.find(END)


def test_block_builds_and_matches_artifacts():
    block = build_block()
    assert block.startswith(BEGIN) and block.endswith(END)
    bench = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    oracle = json.load(open(os.path.join(REPO, "ORACLE_DETAIL.json")))
    # The headline sentence carries the artifact totals verbatim.
    common = [q for q in bench["queries_cold"] if q in oracle["queries"]]
    tc = sum(bench["queries_cold"][q] for q in common)
    tw = sum(bench["queries_warm"][q] for q in common)
    td = sum(oracle["queries"][q] for q in common)
    m = re.search(
        r"Spark cold ([\d.]+) s / warm ([\d.]+) s vs DuckDB ([\d.]+) s",
        block,
    )
    assert m, block
    assert float(m.group(1)) == round(tc, 1)
    assert float(m.group(2)) == round(tw, 1)
    assert float(m.group(3)) == round(td, 1)
    # Slice rows partition the common set.
    rows = re.search(r"\| all (\d+) \|", block)
    dense = re.search(r"\| compute-dense (\d+) ", block)
    floor = re.search(r"\| floor-bound (\d+) ", block)
    assert int(rows.group(1)) == len(common)
    assert int(dense.group(1)) + int(floor.group(1)) == len(common)


def test_block_survives_degenerate_artifact_shapes():
    """ADVICE r7: an all-dense or all-floor pair (or a zero DuckDB
    total) must emit placeholder cells, not raise from max()/division."""
    base = {"sf": 0.1, "cpus": 32, "loadavg": [0.1, 0.1, 0.1]}
    all_dense = {
        **base,
        "queries_cold": {"qx": 1.0},
        "queries_warm": {"qx": 0.5},
    }
    all_floor = {
        **base,
        "queries_cold": {"qy": 1.0},
        "queries_warm": {"qy": 0.5},
    }
    zero_duck = {**base, "queries": {"qx": 0.0}, "heavy": {}}
    for bench, oracle in [
        (all_dense, {**base, "queries": {"qx": 2.0}, "heavy": {}}),
        (all_floor, {**base, "queries": {"qy": 0.1}, "heavy": {}}),
        (all_dense, zero_duck),
        ({**base, "queries_cold": {}, "queries_warm": {}}, zero_duck),
    ]:
        block = build_block(bench=bench, oracle=oracle)
        assert block.startswith(BEGIN) and block.endswith(END)


def test_heavy_lane_is_oracle_paired():
    """VERDICT r7 #1: every heavy-lane Spark timing in the committed
    pair carries a DuckDB oracle timing, and the block prints the
    ratio for each."""
    bench = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    oracle = json.load(open(os.path.join(REPO, "ORACLE_DETAIL.json")))
    heavy = bench.get("heavy_cold", {})
    assert heavy, "committed pair lost its heavy lane"
    oheavy = oracle.get("heavy", {})
    for q in heavy:
        assert q in oheavy, f"{q} has no committed oracle timing"
    block = build_block()
    for q in heavy:
        assert f"{q} {heavy[q]:.2f} s vs {oheavy[q]:.2f} s" in block


def test_artifacts_carry_loadavg():
    for name in ("BENCH_DETAIL.json", "ORACLE_DETAIL.json"):
        d = json.load(open(os.path.join(REPO, name)))
        assert "loadavg" in d and len(d["loadavg"]) == 3, name


def test_require_idle_guard():
    """VERDICT r9 #8: the paired-protocol idle bar lives in the TOOL —
    a committed artifact cannot be written from a busy box (start
    loadavg >= 1.0) without an explicit --force."""
    import pytest

    from bench import require_idle

    require_idle("BENCH_DETAIL.json", 0.34, force=False)  # idle: passes
    require_idle("BENCH_DETAIL.json", 4.12, force=True)  # forced: passes
    with pytest.raises(SystemExit):
        require_idle("BENCH_DETAIL.json", 1.0, force=False)
    with pytest.raises(SystemExit):
        require_idle("ORACLE_DETAIL.json", 2.5, force=False)


def test_anchor_line_renders_when_present():
    """r11: the cross-round drift anchor (tools/bench_anchor.py) renders
    inside the block with its median factor and per-query pairs, and is
    absent when no ANCHOR.json accompanies the pair."""
    base = {"sf": 0.1, "cpus": 32, "loadavg": [0.1, 0.1, 0.1]}
    bench = {**base, "queries_cold": {"qx": 1.0}, "queries_warm": {"qx": 0.5}}
    oracle = {**base, "queries": {"qx": 2.0}, "heavy": {}}
    anchor = {
        "prev_commit": "deadbeefcafe",
        "drift_median": 1.42,
        "queries": {
            "qb0_jaccard_simjoin": {"prev_committed": 2.46, "rerun_now": 3.54, "drift": 1.439},
            "q92_ewma": {"prev_committed": 1.0, "rerun_now": 1.42, "drift": 1.42},
        },
    }
    block = build_block(bench=bench, oracle=oracle, anchor=anchor)
    assert "1.42×" in block and "deadbeef" in block
    assert "qb0_jaccard_simjoin 3.54 s vs 2.46 s committed" in block
    block_no = build_block(bench=bench, oracle=oracle, anchor={})
    # explicit empty dict suppresses the repo-root file fallback
    assert "drift anchor" not in block_no
