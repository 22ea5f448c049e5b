#!/usr/bin/env python3
"""Superlinearity screen (VERDICT r7 ask #7): compare per-query times from
two BENCH_DETAIL.json runs a decade apart (sf1 vs sf10) and flag queries
whose cost grows faster than ~linear in rows.

Usage: python3 tools/superlinearity.py <detail_sf1.json> <detail_sf10.json>

Growth is measured as t_sf10/t_sf1 against the 10x row growth. Queries
under the job-floor at sf1 (< FLOOR seconds) are reported but not flagged:
their sf1 time is scheduler overhead, not data work, so the ratio
overstates growth exactly when the absolute cost is trivial. The flag bar
is 13x (10x linear + 30% allowance for constant-factor shifts like spill
boundaries and code-cache effects).
"""
import json
import sys

FLOOR = 0.30   # sf1 seconds below which the ratio is job-floor noise
BAR = 13.0     # 10x linear growth + 30% allowance
# fixed-input queries, scale-independent by design: fixed CSVs
# (rest1/rest2/flip1), committed media fixtures (x20/x21/x22), and
# capped-cohort oracles (st3/st4 vec_id<2000, d9 vec_id<5000)
FIXED = {"rest1", "rest2", "flip1", "x20", "x21", "x22", "st3", "st4", "d9"}

def load(path):
    with open(path) as f:
        d = json.load(f)
    all_q = {k: float(v) for k, v in d["queries"].items()}
    ok = {k: v for k, v in all_q.items() if v >= 0}
    errored = sorted(set(all_q) - set(ok))
    return ok, errored

def main():
    (a, err_a), (b, err_b) = load(sys.argv[1]), load(sys.argv[2])
    # A query that errors or vanishes at the larger scale is the WORST
    # scaling outcome — it must never silently disappear from the screen.
    dropped = sorted((set(a) | set(b) | set(err_a) | set(err_b))
                     - (set(a) & set(b)))
    rows = []
    for q in sorted(set(a) & set(b)):
        r = b[q] / a[q] if a[q] > 0 else float("inf")
        rows.append((q, a[q], b[q], r))
    flagged, floor_noise = [], []
    print(f"{'query':28s} {'sf1':>8s} {'sf10':>8s} {'ratio':>7s}  note")
    for q, t1, t10, r in sorted(rows, key=lambda x: -x[3]):
        note = ""
        if q in FIXED:
            note = "fixed-input (scale-independent)"
        elif t1 < FLOOR:
            note = "sf1 under job floor - ratio not meaningful"
            if t10 > 5.0:
                note += "; ABSOLUTE sf10 cost high - check"
                flagged.append(q)
            floor_noise.append(q)
        elif r > BAR:
            note = f"SUPERLINEAR (> {BAR:.0f}x)"
            flagged.append(q)
        print(f"{q:28s} {t1:8.3f} {t10:8.3f} {r:7.2f}  {note}")
    print()
    if err_a or err_b:
        print(f"ERRORED (negative bench time): sf1={err_a} sf10={err_b}")
    if dropped:
        print(f"NOT SCREENED (errored or present in only one run): {dropped}")
        flagged.extend(q for q in dropped if q not in flagged)
    print(f"flagged: {flagged if flagged else 'none'}")
    print(f"(job-floor at sf1, unflaggable by ratio: {len(floor_noise)} queries)")

if __name__ == "__main__":
    main()
