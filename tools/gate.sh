#!/bin/bash
# Serialize the heavy verification gates. Every gate-shaped run —
# `sbt test`, a full graft.Verify sweep, Bench floors, a DuckDB
# selfcheck with an oracle timeout budget — goes through this wrapper,
# which holds one exclusive flock for the duration, so no two gates
# ever overlap. Why: timing artifacts and oracle-budget sweeps need a
# quiet machine; round-15's sf1.0 selfcheck flaked q37/q293 (and
# needed hand re-run annotations in the artifact) purely because
# `sbt test` ran concurrently. An artifact produced under this lock
# never needs a "re-verified in isolation" caveat.
#
# Usage: tools/gate.sh <command> [args...]
#   e.g. tools/gate.sh sbt -batch test
#        tools/gate.sh tools/run_graft.sh graft.Verify /root/testdata/sf0.01 /tmp/v
#        GATE_WAIT=10800 tools/gate.sh python3 tools/selfcheck.py ...
# Waits up to GATE_WAIT seconds (default 2h) for the lock, then fails
# loudly rather than running concurrently.
LOCK=/tmp/graft_gate.lock
exec flock -w "${GATE_WAIT:-7200}" "$LOCK" "$@"
