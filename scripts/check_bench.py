#!/usr/bin/env python3
"""Loud consistency gate between Bench's two artifacts (VERDICT r5 #7).

Bench prints a COMPACT JSON line to stdout (sized for the harness's
bounded ~2000-char capture) and writes the FULL per-query map to
bench_detail.json. If the two ever disagree — a truncated pipe, a stale
detail file from an earlier run, an edited budget constant — the round's
numbers are garbage. This script fails loudly instead of letting that
ship.

Usage:
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /tmp/bench_line.json
    python3 scripts/check_bench.py /tmp/bench_line.json [bench_detail.json]

Checks:
  1. both artifacts parse as JSON (one object each);
  2. totals agree to the compact line's 3-decimal rounding;
  3. n_ok / n_err / sf / errors agree exactly;
  4. every query on the compact line exists in the detail map with the
     same 3-decimal value;
  5. len(compact queries) + q_omitted == n_ok (nothing silently dropped).

Dev/driver-side tool (python env); NOT part of the shipped library.
"""
import json
import sys


def fail(msg: str) -> None:
    print(f"BENCH-INCONSISTENT: {msg}", file=sys.stderr)
    sys.exit(1)


def main() -> None:
    line_path = sys.argv[1]
    detail_path = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"

    raw = open(line_path).read().strip()
    if not raw:
        fail(f"{line_path} is empty — no compact line captured")
    # tolerate surrounding log lines: keep the last line containing "metric"
    lines = [l for l in raw.splitlines() if '"metric"' in l]
    if not lines:
        fail(f"{line_path} has no line containing \"metric\"")
    try:
        compact = json.loads(lines[-1])
    except json.JSONDecodeError as e:
        fail(f"compact stdout line is not valid JSON ({e}) — truncated capture?")
    try:
        detail = json.loads(open(detail_path).read())
    except json.JSONDecodeError as e:
        fail(f"{detail_path} is not valid JSON ({e})")

    # tolerance, not rounded equality: Python round() is banker's rounding
    # while the JVM emits half-up 3-decimal values, so an exact .0005
    # boundary would otherwise produce a spurious failure
    if abs(detail["value"] - compact["value"]) > 5e-4:
        fail(f"total mismatch: detail={detail['value']} vs compact={compact['value']}")
    for k in ("n_ok", "n_err", "sf", "errors"):
        if detail.get(k) != compact.get(k):
            fail(f"{k} mismatch: detail={detail.get(k)!r} vs compact={compact.get(k)!r}")
    dq, cq = detail["queries"], compact["queries"]
    missing = [q for q in cq if q not in dq]
    if missing:
        fail(f"compact queries absent from detail: {missing}")
    off = {q: (dq[q], cq[q]) for q in cq if abs(dq[q] - cq[q]) > 5e-4}
    if off:
        fail(f"per-query value drift (detail-rounded vs compact): {off}")
    if len(cq) + compact.get("q_omitted", 0) != compact["n_ok"]:
        fail(f"count drift: {len(cq)} listed + {compact.get('q_omitted', 0)} omitted "
             f"!= n_ok {compact['n_ok']}")
    if len(dq) != detail["n_ok"]:
        fail(f"detail map has {len(dq)} queries but n_ok={detail['n_ok']}")

    # r11: the detail file also records each query's FIRST (cold-path) run
    # so memoized cascades' cold builds are diffable round-over-round.
    # Contract: same keyset as the min map, and first >= min (first is one
    # of the two runs the min was taken over).
    # Pre-r11 archived artifacts lack the column; warn and skip these
    # checks so round-over-round validation against old rounds keeps
    # working (ADVICE r11, low). Current-round artifacts always carry it.
    fq = detail.get("queries_first")
    if fq is None:
        print("WARN: detail has no queries_first (pre-r11 artifact) — "
              "skipping cold-run checks")
    else:
        if set(fq) != set(dq):
            fail(f"queries_first keyset differs from queries: "
                 f"only-first={sorted(set(fq)-set(dq))[:5]}, "
                 f"only-min={sorted(set(dq)-set(fq))[:5]}")
        bad = {q: (fq[q], dq[q]) for q in dq if fq[q] < dq[q] - 1e-9}
        if bad:
            fail(f"first-run timing below the min (impossible): {bad}")

    print(f"bench artifacts consistent: total={detail['value']:.3f}s, "
          f"{detail['n_ok']} ok, {detail['n_err']} err, "
          f"{len(cq)} listed + {compact.get('q_omitted', 0)} omitted")


if __name__ == "__main__":
    main()
