#!/usr/bin/env python3
"""Write the ScalaTest case/suite counts into README.md and
BASELINE.md FROM the actual `sbt test` output, so the two documents
can never drift from reality by hand-editing (round-13 directive #8 —
the counts were right last round but had been hand-edited twice).

Usage:
    sbt test 2>&1 | tee /tmp/sbt_test.log
    python3 tools/sync_test_counts.py /tmp/sbt_test.log

Parses the summary lines sbt/ScalaTest print:
    [info] Total number of tests run: NNN
    [info] Suites: completed NN, aborted 0
    [info] Tests: succeeded NNN, failed 0, ...
Refuses to write anything unless failed == 0 and aborted == 0.
Dev tool only - not part of the shipped library.
"""
import re
import sys

log = open(sys.argv[1]).read()
run = re.search(r"Total number of tests run: (\d+)", log)
suites = re.search(r"Suites: completed (\d+), aborted (\d+)", log)
tests = re.search(r"Tests: succeeded (\d+), failed (\d+)", log)
if not (run and suites and tests):
    raise SystemExit("no ScalaTest summary found in log")
n_run, n_suites = int(run.group(1)), int(suites.group(1))
n_aborted, n_ok, n_fail = int(suites.group(2)), int(tests.group(1)), int(tests.group(2))
if n_fail or n_aborted or n_ok != n_run:
    raise SystemExit(
        f"refusing to sync counts from a non-green run: "
        f"{n_ok}/{n_run} ok, {n_fail} failed, {n_aborted} suites aborted")

def patch(path, pattern, repl):
    s = open(path).read()
    s2, n = re.subn(pattern, repl, s)
    if n != 1:
        raise SystemExit(f"{path}: expected exactly 1 match for {pattern!r}, got {n}")
    open(path, "w").write(s2)
    print(f"{path}: {pattern!r} -> {repl!r}")

patch("README.md",
      r"`sbt test` \(\d+ cases, \d+ suites\)",
      f"`sbt test` ({n_run} cases, {n_suites} suites)")
patch("BASELINE.md",
      r"\*\*\d+ ScalaTest cases across \d+ suites, green\*\*",
      f"**{n_run} ScalaTest cases across {n_suites} suites, green**")
print(f"synced: {n_run} cases / {n_suites} suites (0 failures)")
