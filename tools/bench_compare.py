#!/usr/bin/env python3
"""Diff two graft.Bench output files (BENCH_LOCAL.json or any file whose
last JSON-bearing line has a "queries" map) and print per-query deltas:
regressions first, then improvements, then adds/removes. Dev tool for
keeping the round-over-round bench story honest — run after any perf
change:

    python3 tools/bench_compare.py /tmp/bench_before.json BENCH_LOCAL.json

A delta below NOISE_SEC (default 0.4 s — the observed warm-run jitter at
sf0.1 on local[32]) is reported as noise, not regression.
"""
import json, sys

NOISE_SEC = 0.4


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
    both = sorted(set(qa) & set(qb))
    deltas = [(qb[q] - qa[q], q) for q in both]
    regress = sorted((d, q) for d, q in deltas if d > NOISE_SEC)
    improve = sorted((d, q) for d, q in deltas if d < -NOISE_SEC)
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))

    ta = sum(qa[q] for q in both)
    tb = sum(qb[q] for q in both)
    print(f"comparable window: {len(both)} queries, "
          f"{ta:.1f}s -> {tb:.1f}s ({tb - ta:+.1f}s)")
    if "load" in a or "load" in b:
        la = sum(a.get("load", {}).values())
        lb = sum(b.get("load", {}).values())
        print(f"load phase: {la:.1f}s -> {lb:.1f}s")
    for d, q in sorted(regress, reverse=True):
        print(f"  REGRESS  {q}: {qa[q]:.2f}s -> {qb[q]:.2f}s ({d:+.2f}s)")
    for d, q in improve:
        print(f"  improve  {q}: {qa[q]:.2f}s -> {qb[q]:.2f}s ({d:+.2f}s)")
    if added:
        print(f"  added ({len(added)}): " + ", ".join(
            f"{q} {qb[q]:.2f}s" for q in added))
    if removed:
        print(f"  removed ({len(removed)}): " + ", ".join(removed))
    n_noise = len(both) - len(regress) - len(improve)
    print(f"  within noise (±{NOISE_SEC}s): {n_noise} queries")
    sys.exit(1 if regress else 0)


if __name__ == "__main__":
    main()
