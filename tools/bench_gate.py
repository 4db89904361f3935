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
  - ratios are normalized by the run's MEDIAN ratio before gating: a
    shared-machine slowdown shifts every query uniformly (the observed
    r2->r3 signature: 33 untouched queries drifting 1.2-1.7x together),
    which moves the median; a genuine single-query regression sticks out
    ABOVE the median. The raw and adjusted ratios are both printed.
  - breach  = adjusted ratio >= RATIO_MAX (inclusive — r13's q106 sat at
    exactly 1.5006x and slipped through a strict >) and absolute slowdown
    beyond the median-scaled expectation > ABS_FLOOR seconds (tiny queries
    are all JIT/page-cache noise; a 0.1s->0.2s "2x" is not a regression
    signal worth failing a build over)
  - gate-edge = RAW ratio >= RATIO_MAX with the same absolute floor, on a
    run whose median says the machine is at baseline speed (med <=
    EDGE_MED_TRUST). Median normalization can forgive a genuine
    single-query breach when the whole run drifted a few percent (the
    r13 q106 escape: raw 1.50x, median 1.02 -> adjusted 1.47x, rc 0);
    when the median itself is near 1.0 the raw ratio is trustworthy and
    a >= RATIO_MAX query FAILS the gate by name. On a slow machine
    (med > EDGE_MED_TRUST) raw ratios are noise and only the
    median-adjusted rule gates.
  - queries missing a baseline entry are reported as NEW (info only) —
    add them to the baseline when they land
  - queries in the baseline but absent from the run are reported MISSING
    and fail the gate (a silently dropped query is worse than a slow one)
"""
import json
import statistics
import sys

RATIO_MAX = 1.5
ABS_FLOOR = 0.2  # seconds
# Raw-ratio gating is only trustworthy when the run's median says the
# machine is at (or very near) baseline speed; above this the machine is
# slow and only median-adjusted ratios gate.
EDGE_MED_TRUST = 1.15
# Backstop for the case median normalization is blind to (a commit slowing
# MOST queries): the un-normalized suite total. Its threshold sits ABOVE
# the documented machine-noise band (uniform 1.2-1.7x, the r2->r3
# signature) so noise doesn't trip it — a uniform sub-2x code regression
# is the accepted blind spot of a single-run gate on a shared machine.
TOTAL_MAX = 2.0


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

    # A failed query still reports an elapsed time (Bench lists it in
    # "failed" so a fast failure can't read as a fast query) — and if the
    # query is NEW (no baseline yet), per-query gating never sees it at
    # all. Treat any failure as a gate failure in its own right.
    failed = bench.get("failed") or []
    if failed:
        for q in failed:
            print(f"FAILED   {q}: query errored during the bench run")
        print(f"GATE FAIL: {len(failed)} failed querie(s) {failed}")
        sys.exit(1)

    shared = [(q, base[q], cur[q]) for q in sorted(cur) if q in base]
    new = [q for q in sorted(cur) if q not in base]
    ratios = [c / b for _, b, c in shared if b > 0]
    # Median of per-query ratios = the run's machine-speed factor. Clamp
    # below at 1.0 so a fast machine never masks a real regression.
    med = max(statistics.median(ratios), 1.0) if ratios else 1.0

    rows, breaches = [], []
    for q, b, c in shared:
        ratio = c / b if b > 0 else float("inf")
        adj = ratio / med
        breach = adj >= RATIO_MAX and (c - b * med) > ABS_FLOOR
        # gate-edge: on an at-baseline-speed run the RAW ratio gates too,
        # so a query sitting exactly on the threshold can't hide behind a
        # few percent of benign median drift (the r13 q106 escape)
        edge = (not breach and med <= EDGE_MED_TRUST
                and ratio >= RATIO_MAX and (c - b) > ABS_FLOOR)
        rows.append((adj, ratio, q, b, c, breach or edge))
        if breach:
            breaches.append(q)
        elif edge:
            breaches.append(f"{q} (gate-edge: raw {ratio:.2f}x >= "
                            f"{RATIO_MAX}x at med {med:.2f})")
    missing = sorted(set(base) - set(cur))

    rows.sort(reverse=True)
    print(f"machine-speed median ratio: {med:.2f}x "
          f"(per-query ratios gated relative to this)")
    print(f"{'query':<28} {'base':>8} {'now':>8} {'ratio':>7} {'adj':>7}")
    for adj, ratio, q, b, c, breach in rows:
        flag = "  << REGRESSION" if breach else ""
        print(f"{q:<28} {b:>8.3f} {c:>8.3f} {ratio:>6.2f}x {adj:>6.2f}x{flag}")
    total_b = sum(base[q] for q in cur if q in base)
    total_c = sum(c for q, c in cur.items() if q in base)
    if total_b > 0:
        total_ratio = total_c / total_b
        print(f"{'TOTAL (shared)':<28} {total_b:>8.3f} {total_c:>8.3f} "
              f"{total_ratio:>6.2f}x")
        # absolute backstop: median normalization intentionally forgives a
        # uniform machine-speed shift, but a commit that slows MOST queries
        # would also shift the median and slip through per-query gating —
        # the un-normalized suite total catches that case (threshold above
        # the known noise band so a slow CI machine doesn't false-fail)
        if total_ratio > TOTAL_MAX:
            breaches.append(
                f"TOTAL {total_ratio:.2f}x > {TOTAL_MAX}x (suite-wide slowdown "
                f"beyond the noise band — treat as a code regression)")
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
    print(f"GATE PASS: {len(rows)} queries within {RATIO_MAX}x of the "
          f"median-adjusted baseline (+{len(new)} new)")


if __name__ == "__main__":
    main()
