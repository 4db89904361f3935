#!/usr/bin/env python3
"""Negative tests for tools/bench_gate.py (VERDICT r13 #7: the gate must
FAIL at the judge's >= 1.5x threshold and name the offending query — r13's
q106 sat at exactly 1.5006x raw with a 1.02 median and returned rc 0).

Run: python3 tools/test_bench_gate.py
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(HERE, "bench_gate.py")


def run_gate(bench: dict, baseline: dict):
    with tempfile.TemporaryDirectory() as d:
        bpath = os.path.join(d, "bench.out")
        with open(bpath, "w") as f:
            f.write("[info] " + json.dumps(bench) + "\n")
        basepath = os.path.join(d, "baseline.json")
        with open(basepath, "w") as f:
            json.dump(baseline, f)
        p = subprocess.run([sys.executable, GATE, bpath, basepath],
                           capture_output=True, text=True)
        return p.returncode, p.stdout + p.stderr


def bench_of(queries):
    return {"metric": "suite_seconds", "value": sum(queries.values()),
            "unit": "sec", "sf": 0.1, "queries": queries}


def main():
    # 20 stable 1.00x queries pin the median at 1.0
    stable_base = {f"q{i:02d}": 1.0 for i in range(20)}

    # 1. the r13 escape: one query at exactly 1.5006x raw, median ~1.0
    #    -> must FAIL and name the query
    cur = dict(stable_base)
    cur["q106"] = 1.5528
    rc, out = run_gate(bench_of(cur), {"queries": {**stable_base,
                                                  "q106": 1.0348}})
    assert rc != 0, f"gate-edge run must fail (rc={rc})\n{out}"
    assert "q106" in out and "GATE FAIL" in out, out
    print("PASS  raw >=1.5x at med ~1.0 fails by name")

    # 2. exactly AT the adjusted threshold (>= not >): 1.5x on a 1.0
    #    median with a large absolute slowdown -> FAIL
    cur = dict(stable_base)
    cur["q50"] = 3.0
    rc, out = run_gate(bench_of(cur), {"queries": {**stable_base,
                                                  "q50": 2.0}})
    assert rc != 0 and "q50" in out, out
    print("PASS  adjusted ratio exactly 1.5x fails (inclusive threshold)")

    # 3. uniformly slow machine (every query 1.6x) -> median absorbs it,
    #    gate PASSES (raw-ratio gating must not fire when med > trust)
    cur = {q: b * 1.6 for q, b in stable_base.items()}
    rc, out = run_gate(bench_of(cur), {"queries": stable_base})
    assert rc == 0, f"uniform machine slowdown must pass\n{out}"
    print("PASS  uniform 1.6x machine drift passes (median-normalized)")

    # 4. clean run passes
    rc, out = run_gate(bench_of(dict(stable_base)),
                       {"queries": stable_base})
    assert rc == 0, out
    print("PASS  clean run passes")

    # 5. tiny absolute slowdowns below ABS_FLOOR never gate
    cur = dict(stable_base)
    cur["q77"] = 0.19  # 1.9x of a 0.1s baseline — noise floor
    rc, out = run_gate(bench_of(cur), {"queries": {**stable_base,
                                                  "q77": 0.1}})
    assert rc == 0, out
    print("PASS  sub-floor absolute slowdown ignored")

    print("ALL bench_gate negative tests pass")


if __name__ == "__main__":
    main()
