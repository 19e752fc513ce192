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
    python3 scripts/check_bench.py /tmp/bench_line.json [bench_detail.json] [--prev PATH]

--prev: a previous round's bench_detail.json to diff the COLD column
against (VERDICT r12 #4). When omitted, the last committed
bench_detail.json (`git show HEAD:bench_detail.json`) is used if
available. A query whose cold (first-run) time grew more than
COLD_GROWTH_MAX x AND by more than COLD_GROWTH_ABS_S seconds fails the
gate — a cold-path regression in a memoized family must fail the round,
not hide behind the warm min.

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


# cold-path regression envelope: generous on purpose (cold runs absorb
# JIT/scan warmup and host noise); both conditions must hold to flag
COLD_GROWTH_MAX = 3.0     # x growth vs previous round's cold time
COLD_GROWTH_ABS_S = 1.0   # and at least this many seconds slower


def prev_detail(detail_path: str):
    """The previous round's detail artifact: --prev PATH if given, else
    the last committed copy of detail_path (the driver commits artifacts
    at round close). Returns (dict | None, source-description)."""
    if "--prev" in sys.argv:
        idx = sys.argv.index("--prev") + 1
        if idx >= len(sys.argv):
            fail("--prev requires a path argument")
        p = sys.argv[idx]
        try:
            return json.loads(open(p).read()), p
        except (OSError, json.JSONDecodeError) as e:
            fail(f"--prev {p} unreadable: {e}")
    import os
    import subprocess
    try:
        # HEAD:./<name> resolves relative to git's cwd (-C dir), so a
        # detail file in a subdirectory diffs against ITS committed copy,
        # not a same-named file at the repo root (review r13)
        out = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(detail_path)) or ".",
             "show", f"HEAD:./{os.path.basename(detail_path)}"],
            capture_output=True, text=True, timeout=30)
        if out.returncode == 0 and out.stdout.strip():
            return json.loads(out.stdout), "git HEAD"
    except Exception:
        pass
    return None, None


def check_cold_regression(detail: dict, prev: dict, src: str) -> None:
    """Flag queries whose cold (first-run) time regressed past the
    envelope vs the previous round. Skips silently when either side
    lacks the queries_first column (pre-r11 artifacts)."""
    cur, old = detail.get("queries_first"), prev.get("queries_first")
    if cur is None or old is None:
        print("WARN: cold-regression diff skipped (queries_first missing "
              "on one side)")
        return
    flagged = {}
    skipped = 0
    for q, t in cur.items():
        p = old.get(q)
        if p is None:
            skipped += 1  # new query this round: no baseline to regress from
            continue
        if t > p * COLD_GROWTH_MAX and t - p > COLD_GROWTH_ABS_S:
            flagged[q] = (p, t)
    if flagged:
        # >=3 unrelated queries tripping together is the CONTENTION
        # signature (another JVM on the host — seen live at r13 close:
        # a bench overlapping a Verify sweep tripped 3-4 scattered
        # queries at 3-10x), not a code regression, which shows up as
        # one query or one memoized family. Still a failure — the
        # numbers are not trustworthy either way — but say which.
        hint = ("; >=3 scattered queries -> likely HOST CONTENTION, "
                "re-run on an idle host before concluding code regression"
                if len(flagged) >= 3 else "")
        fail(f"cold-path regression vs {src} (>{COLD_GROWTH_MAX}x and "
             f">{COLD_GROWTH_ABS_S}s): " +
             ", ".join(f"{q} {p:.2f}s->{t:.2f}s"
                       for q, (p, t) in sorted(flagged.items())) + hint)
    extra = f" ({skipped} new, no baseline)" if skipped else ""
    print(f"cold column checked vs {src}: {len(cur) - skipped} queries"
          f"{extra}, 0 past the {COLD_GROWTH_MAX}x/{COLD_GROWTH_ABS_S}s "
          f"envelope")


def main() -> None:
    line_path = sys.argv[1]
    detail_path = sys.argv[2] if len(sys.argv) > 2 and \
        not sys.argv[2].startswith("--") else "bench_detail.json"

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
        prev, src = prev_detail(detail_path)
        if prev is None:
            print("WARN: no previous detail artifact found — "
                  "cold-regression diff skipped")
        else:
            check_cold_regression(detail, prev, src)

    print(f"bench artifacts consistent: total={detail['value']:.3f}s, "
          f"{detail['n_ok']} ok, {detail['n_err']} err, "
          f"{len(cq)} listed + {compact.get('q_omitted', 0)} omitted")


if __name__ == "__main__":
    main()
