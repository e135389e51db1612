#!/bin/bash
# Round-17 close-out chain: full suite, three-scale sweeps (with the
# cross-scale vacuity WARN chained through SELFCHECK_BASELINE_DIR),
# benches (sf1.0 suite at reps 2 — round-16 directive #5), floors,
# lint, scaling audit, test-count sync — sequential under one gate
# hold, quiet machine. Dev tool only.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=8
sbt -batch test > /tmp/sbt_test_r17.log 2>&1 || { echo TEST_FAILED; exit 1; }
echo STEP_TEST_OK
tools/run_graft.sh graft.Verify /root/testdata/sf0.01 /tmp/v_sf001_r17 >/tmp/verify_sf001_r17.log 2>&1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/v_sf001_r17 > /tmp/sc_sf001_r17.txt 2>&1 || true
echo STEP_SF001_OK
tools/run_graft.sh graft.Verify /root/testdata/sf0.1 /tmp/v_sf01_r17 >/tmp/verify_sf01_r17.log 2>&1
SELFCHECK_BASELINE_DIR=/tmp/v_sf001_r17 \
  python3 tools/selfcheck.py /root/testdata/sf0.1 /tmp/v_sf01_r17 > /tmp/sc_sf01_r17.txt 2>&1 || true
echo STEP_SF01_OK
tools/run_graft.sh graft.Verify /root/repo/target/sf1.0 /tmp/v_sf1_r17 >/tmp/verify_sf1_r17.log 2>&1
SELFCHECK_ORACLE_TIMEOUT=600 SELFCHECK_BASELINE_DIR=/tmp/v_sf01_r17 \
  python3 tools/selfcheck.py /root/repo/target/sf1.0 /tmp/v_sf1_r17 > /tmp/sc_sf1_r17.txt 2>&1 || true
echo STEP_SF1_OK
export SPARK_GRAFT_CPUS=32
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  tools/run_graft.sh graft.Bench 2>/tmp/bench_sf01_r17.log \
  | grep -F '"metric"' | head -1 > /tmp/BENCH_r17_floors.json
echo STEP_BENCH01_OK
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1.0 SPARK_GRAFT_BENCH_REPS=2 \
  tools/run_graft.sh graft.Bench 2>/tmp/bench_sf1_r17.log \
  | grep -F '"metric"' | head -1 > /tmp/BENCH_SF1_r17.json
echo STEP_BENCH1_OK
# floors set: top-30 sf1.0 walls from the fresh suite run + the drift
# watch trio + both funnel audits; GUARD against an empty/missing set
# (the round-16 chain silently fell back to the full suite when the
# file was absent — ADVICE item)
python3 - <<'PY'
import json
d = json.load(open('/tmp/BENCH_SF1_r17.json'))
top = sorted(d['queries'].items(), key=lambda kv: -kv[1])[:30]
names = {k for k, _ in top} | {"q248_srp_rerank", "q300_maxsim_retrieval",
  "q25_ngram_jaccard_blocked", "q341_simjoin_funnel", "q342_lshband_funnel"}
open('/tmp/floors_set_r17.txt', 'w').write(",".join(sorted(names)))
PY
[ -s /tmp/floors_set_r17.txt ] || { echo MISSING_FLOORS_SET; exit 1; }
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1.0 \
  tools/run_graft.sh graft.Bench "$(cat /tmp/floors_set_r17.txt)" --reps 2 2>/tmp/bench_sf1_floors_r17.log \
  | grep -F '"metric"' | head -1 > /tmp/BENCH_SF1_r17_floors.json
[ -s /tmp/BENCH_SF1_r17_floors.json ] || { echo MISSING_FLOORS_OUT; exit 1; }
echo STEP_FLOORS_OK
export SPARK_GRAFT_CPUS=8
tools/run_graft.sh graft.tools.LintDump /root/testdata/sf0.1 /tmp/LINT_r17.json >/tmp/lint_r17.log 2>&1
echo STEP_LINT_OK
cp /tmp/BENCH_r17_floors.json /tmp/BENCH_SF1_r17.json /tmp/BENCH_SF1_r17_floors.json /tmp/LINT_r17.json /root/repo/
python3 tools/scaling_audit.py BENCH_r17_floors.json BENCH_SF1_r17.json BENCH_SF1_r17_floors.json > SCALING_r17.json || true
echo STEP_SCALING_OK
cp /tmp/sc_sf01_r17.txt SELFCHECK_SF01_r17.txt
cp /tmp/sc_sf1_r17.txt SELFCHECK_SF1_r17.txt
python3 tools/sync_test_counts.py /tmp/sbt_test_r17.log || true
echo FINAL_CHAIN_DONE
