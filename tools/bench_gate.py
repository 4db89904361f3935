#!/usr/bin/env python3
"""Per-query bench regression gate (dev tool — the shipped library is pure
Scala/Spark). Compares a fresh `graft.Bench` JSON line against the committed
BENCH_BASELINE.json and fails loudly on per-query regression, so bench drift
is classified (noise vs regression) instead of unfalsifiable.

Usage:
  python3 tools/bench_gate.py <bench_output_file> [baseline_json]

<bench_output_file> may be the raw sbt output — the first line containing
'"metric"' is parsed (leading '[info] ' stripped).

Rules:
  - breach  = ratio > RATIO_MAX and absolute slowdown > ABS_FLOOR seconds
    (tiny queries are all JIT/page-cache noise; a 0.1s->0.2s "2x" is not
    a regression signal worth failing a build over)
  - queries missing a baseline entry are reported as NEW (info only) —
    add them to the baseline when they land
  - queries in the baseline but absent from the run are reported MISSING
    and fail the gate (a silently dropped query is worse than a slow one)
"""
import json
import sys

RATIO_MAX = 1.5
ABS_FLOOR = 0.2  # seconds


def load_bench(path: str) -> dict:
    with open(path) as f:
        for line in f:
            if '"metric"' in line:
                line = line.strip()
                if line.startswith("[info]"):
                    line = line[len("[info]"):].strip()
                return json.loads(line)
    raise SystemExit(f"no bench JSON line ('\"metric\"') found in {path}")


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    bench = load_bench(sys.argv[1])
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"
    base = json.load(open(base_path))["queries"]
    cur = bench["queries"]

    rows, breaches, new = [], [], []
    for q in sorted(cur):
        if q not in base:
            new.append(q)
            continue
        b, c = base[q], cur[q]
        ratio = c / b if b > 0 else float("inf")
        breach = ratio > RATIO_MAX and (c - b) > ABS_FLOOR
        rows.append((ratio, q, b, c, breach))
        if breach:
            breaches.append(q)
    missing = sorted(set(base) - set(cur))

    rows.sort(reverse=True)
    print(f"{'query':<28} {'base':>8} {'now':>8} {'ratio':>7}")
    for ratio, q, b, c, breach in rows:
        flag = "  << REGRESSION" if breach else ""
        print(f"{q:<28} {b:>8.3f} {c:>8.3f} {ratio:>6.2f}x{flag}")
    total_b = sum(base[q] for q in cur if q in base)
    total_c = sum(c for q, c in cur.items() if q in base)
    if total_b > 0:
        print(f"{'TOTAL (shared)':<28} {total_b:>8.3f} {total_c:>8.3f} "
              f"{total_c / total_b:>6.2f}x")
    else:
        print(f"{'TOTAL (shared)':<28} n/a — no shared queries with baseline")
    for q in new:
        print(f"NEW      {q}: {cur[q]:.3f}s (no baseline — add on next refresh)")
    for q in missing:
        print(f"MISSING  {q}: in baseline but not in this run")

    if breaches or missing:
        print(f"GATE FAIL: {len(breaches)} regression(s) "
              f"{breaches}, {len(missing)} missing {missing}")
        sys.exit(1)
    print(f"GATE PASS: {len(rows)} queries within {RATIO_MAX}x "
          f"(+{len(new)} new)")


if __name__ == "__main__":
    main()
