#!/usr/bin/env python3
"""Fixture test for check_bench.py's gates — especially the r13
cold-regression flag path (VERDICT r12 #4: a checker that only ever sees
healthy input is an unproven gate).

Run: python3 scripts/test_check_bench.py   (exit 0 = all cases pass)
Dev-only tool; NOT part of the shipped library.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check_bench.py")


def artifacts(tmp, queries, first, total=None):
    total = total if total is not None else round(sum(queries.values()), 3)
    detail = {
        "metric": "bench_total", "value": total, "unit": "sec",
        "sf": "sf0.1", "n_ok": len(queries), "n_err": 0, "errors": [],
        "queries": queries, "queries_first": first,
    }
    compact = dict(detail)
    compact["q_omitted"] = 0
    dpath = os.path.join(tmp, "detail.json")
    lpath = os.path.join(tmp, "line.json")
    json.dump(detail, open(dpath, "w"))
    open(lpath, "w").write(json.dumps(compact) + "\n")
    return lpath, dpath


def run(lpath, dpath, prev=None):
    cmd = [sys.executable, CHECK, lpath, dpath]
    if prev:
        cmd += ["--prev", prev]
    return subprocess.run(cmd, capture_output=True, text=True)


def main():
    fails = []

    def case(name, ok, r, needle=None):
        out = r.stdout + r.stderr
        if ok != (r.returncode == 0) or (needle and needle not in out):
            fails.append(f"{name}: rc={r.returncode} out={out!r}")
        else:
            print(f"ok: {name}")

    with tempfile.TemporaryDirectory() as tmp:
        q = {"q_a": 0.5, "q_b": 2.0}
        # previous round: q_b cold was 1.2s
        prev = os.path.join(tmp, "prev.json")
        json.dump({"queries": q, "queries_first": {"q_a": 0.6, "q_b": 1.2},
                   "value": 2.5, "n_ok": 2}, open(prev, "w"))

        # 1. healthy: cold within the envelope -> exit 0
        l, d = artifacts(tmp, q, {"q_a": 0.7, "q_b": 2.4})
        case("healthy cold column", True, run(l, d, prev), "cold column checked")

        # 2. regression: q_b cold 1.2 -> 6.0 (5x and +4.8s) -> exit 1
        l, d = artifacts(tmp, q, {"q_a": 0.7, "q_b": 6.0})
        case("cold regression flagged", False, run(l, d, prev),
             "cold-path regression")

        # 2b. >=3 scattered trips -> contention hint in the message
        q3 = {"q_a": 0.5, "q_b": 2.0, "q_c": 0.4}
        p3w = os.path.join(tmp, "p3w.json")
        json.dump({"queries_first":
                   {"q_a": 0.6, "q_b": 1.2, "q_c": 0.5}}, open(p3w, "w"))
        l, d = artifacts(tmp, q3, {"q_a": 4.0, "q_b": 6.0, "q_c": 3.0})
        case("contention signature hinted", False, run(l, d, p3w),
             "HOST CONTENTION")

        # 3. big ratio but tiny absolute growth (0.02 -> 0.09) -> exit 0
        l, d = artifacts(tmp, {"q_a": 0.01}, {"q_a": 0.09})
        p2 = os.path.join(tmp, "p2.json")
        json.dump({"queries_first": {"q_a": 0.02}}, open(p2, "w"))
        case("sub-second growth not flagged", True, run(l, d, p2),
             "cold column checked")

        # 4. no previous artifact anywhere -> warn, exit 0
        l, d = artifacts(tmp, q, {"q_a": 0.7, "q_b": 2.4})
        env_git_absent = run(l, d)  # tmp dir is not a git repo
        case("missing prev warns and passes", True, env_git_absent,
             "cold-regression diff skipped")

        # 5. pre-r11 prev (no queries_first) -> warn, exit 0
        p3 = os.path.join(tmp, "p3.json")
        json.dump({"queries": q}, open(p3, "w"))
        l, d = artifacts(tmp, q, {"q_a": 0.7, "q_b": 2.4})
        case("pre-r11 prev skipped", True, run(l, d, p3),
             "queries_first missing")

        # 6. the pre-existing consistency gate still trips (total drift)
        l, d = artifacts(tmp, q, {"q_a": 0.7, "q_b": 2.4})
        blob = json.load(open(d))
        blob["value"] = 99.0
        json.dump(blob, open(d, "w"))
        case("total mismatch still fails", False, run(l, d, prev),
             "total mismatch")

    if fails:
        print("\n".join(["FAIL " + f for f in fails]), file=sys.stderr)
        sys.exit(1)
    print("all check_bench fixture cases pass")


if __name__ == "__main__":
    main()
