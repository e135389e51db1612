#!/usr/bin/env python3
"""Attribute per-query wall-time deltas between two graft.Bench
artifacts using the recorded ACTUALS (shuffle_recs / scan_bytes /
scan_rows / shuffles in the "stats" map): a wall delta with IDENTICAL
actuals is machine conditions (contention, thermal, cache pressure);
a delta with CHANGED actuals is a plan change and needs a code-level
explanation. This is the round-over-round referee for "2x regression
with no code change" claims — run it against the prior round's quiet
artifact:

    python3 tools/actuals_diff.py BENCH_r07_quiet.json BENCH_r08_quiet.json

Accepts any file whose last JSON-bearing line has "queries" (walls)
and optionally "stats" (actuals); BENCH_LOCAL.json and the committed
quiet artifacts both qualify. Dev tool only — not part of the library.
"""
import json
import sys

RATIO = 1.5  # flag wall deltas at or beyond this factor either way
ACTUAL_KEYS = ("shuffle_recs", "scan_bytes", "scan_rows", "shuffles")
# scan_bytes is file-layout-sensitive: a harness testdata regen shifts
# parquet sizes a few percent on every table without any plan change,
# so byte deltas under this relative tolerance (with rows/records/
# shuffles identical) count as identical actuals, not a plan change.
BYTES_TOL = 0.10


def actuals_equal(aa, ab):
    """Identical actuals, allowing scan_bytes to drift within
    BYTES_TOL when every row/record/shuffle count matches exactly."""
    exact = [k for k in ACTUAL_KEYS if k != "scan_bytes"]
    if any(aa[k] != ab[k] for k in exact):
        return False
    ba, bb = aa["scan_bytes"], ab["scan_bytes"]
    if ba == bb:
        return True
    if not (isinstance(ba, (int, float)) and isinstance(bb, (int, float))):
        return False
    base = max(abs(ba), abs(bb))
    return base > 0 and abs(ba - bb) / base <= BYTES_TOL


def load(path):
    data = None
    for line in open(path, encoding="utf-8"):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            try:
                data = json.loads(line)
            except json.JSONDecodeError:
                continue
    if data is None:
        raise SystemExit(f"no parseable bench JSON line in {path}")
    return data


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    sa, sb = a.get("stats", {}), b.get("stats", {})
    both = sorted(set(qa) & set(qb))

    machine, plan, unattrib = [], [], []
    for q in both:
        wa, wb = qa[q], qb[q]
        if wa <= 0 or wb <= 0:
            continue
        ratio = wb / wa
        if 1 / RATIO < ratio < RATIO:
            continue
        aa = {k: sa.get(q, {}).get(k) for k in ACTUAL_KEYS}
        ab = {k: sb.get(q, {}).get(k) for k in ACTUAL_KEYS}
        if q not in sa or q not in sb:
            unattrib.append((ratio, q, "no actuals recorded on one side"))
        elif actuals_equal(aa, ab):
            machine.append((ratio, q))
        else:
            changed = {k: (aa[k], ab[k]) for k in ACTUAL_KEYS if aa[k] != ab[k]}
            plan.append((ratio, q, changed))

    print(f"comparable window: {len(both)} queries "
          f"({sum(qa[q] for q in both):.1f}s -> {sum(qb[q] for q in both):.1f}s)")
    print(f"\nMACHINE (wall moved >= {RATIO}x, actuals identical): {len(machine)}")
    for r, q in sorted(machine, reverse=True):
        print(f"  x{r:.2f}  {q}  ({qa[q]:.2f}s -> {qb[q]:.2f}s)")
    print(f"\nPLAN CHANGE (actuals differ): {len(plan)}")
    for r, q, changed in sorted(plan, reverse=True):
        print(f"  x{r:.2f}  {q}  ({qa[q]:.2f}s -> {qb[q]:.2f}s)  {changed}")
    print(f"\nUNATTRIBUTABLE (missing actuals): {len(unattrib)}")
    for r, q, why in sorted(unattrib, reverse=True):
        print(f"  x{r:.2f}  {q}  {why}")


if __name__ == "__main__":
    main()
