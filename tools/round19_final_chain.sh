#!/bin/bash
# Round-19 close-out chain: full suite, three-scale sweeps (with the
# cross-scale vacuity WARN chained through SELFCHECK_BASELINE_DIR),
# benches (sf1.0 suite at reps 2), floors, lint, scaling audit,
# test-count sync — sequential under one gate hold, quiet machine.
# Dev tool only.
#
# Round-19 hardening (round-18 ADVICE): set -o pipefail everywhere,
# and every bench JVM writes its stdout to a temp file FIRST so the
# driver's exit code is checked before the metric line is extracted —
# a bench that prints its line and then crashes can no longer pass on
# head's exit status.
set -eo pipefail
cd /root/repo
export SPARK_GRAFT_CPUS=8
sbt -batch test > /tmp/sbt_test_r19.log 2>&1 || { echo TEST_FAILED; exit 1; }
echo STEP_TEST_OK
tools/run_graft.sh graft.Verify /root/testdata/sf0.01 /tmp/v_sf001_r19 >/tmp/verify_sf001_r19.log 2>&1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/v_sf001_r19 > /tmp/sc_sf001_r19.txt 2>&1 \
  || { echo SELFCHECK_SF001_FAILED; tail -5 /tmp/sc_sf001_r19.txt; exit 1; }
grep -q 'ALL GREEN' /tmp/sc_sf001_r19.txt || { echo SF001_NOT_GREEN; exit 1; }
echo STEP_SF001_OK
tools/run_graft.sh graft.Verify /root/testdata/sf0.1 /tmp/v_sf01_r19 >/tmp/verify_sf01_r19.log 2>&1
SELFCHECK_BASELINE_DIR=/tmp/v_sf001_r19 \
  python3 tools/selfcheck.py /root/testdata/sf0.1 /tmp/v_sf01_r19 > /tmp/sc_sf01_r19.txt 2>&1 \
  || { echo SELFCHECK_SF01_FAILED; tail -5 /tmp/sc_sf01_r19.txt; exit 1; }
grep -q 'ALL GREEN' /tmp/sc_sf01_r19.txt || { echo SF01_NOT_GREEN; exit 1; }
echo STEP_SF01_OK
tools/run_graft.sh graft.Verify /root/repo/target/sf1.0 /tmp/v_sf1_r19 >/tmp/verify_sf1_r19.log 2>&1
SELFCHECK_ORACLE_TIMEOUT=600 SELFCHECK_BASELINE_DIR=/tmp/v_sf01_r19 \
  python3 tools/selfcheck.py /root/repo/target/sf1.0 /tmp/v_sf1_r19 > /tmp/sc_sf1_r19.txt 2>&1 \
  || { echo SELFCHECK_SF1_FAILED; tail -5 /tmp/sc_sf1_r19.txt; exit 1; }
grep -q 'ALL GREEN' /tmp/sc_sf1_r19.txt || { echo SF1_NOT_GREEN; exit 1; }
echo STEP_SF1_OK
export SPARK_GRAFT_CPUS=32
# bench stdout lands in a temp file under pipefail, so the JVM's own
# exit status gates the step before the metric line is extracted
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  tools/run_graft.sh graft.Bench > /tmp/bench_sf01_r19.out 2>/tmp/bench_sf01_r19.log
grep -F '"metric"' /tmp/bench_sf01_r19.out | head -1 > /tmp/BENCH_r19_floors.json
[ -s /tmp/BENCH_r19_floors.json ] || { echo MISSING_BENCH01_OUT; exit 1; }
echo STEP_BENCH01_OK
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1.0 SPARK_GRAFT_BENCH_REPS=2 \
  tools/run_graft.sh graft.Bench > /tmp/bench_sf1_r19.out 2>/tmp/bench_sf1_r19.log
grep -F '"metric"' /tmp/bench_sf1_r19.out | head -1 > /tmp/BENCH_SF1_r19.json
[ -s /tmp/BENCH_SF1_r19.json ] || { echo MISSING_BENCH1_OUT; exit 1; }
echo STEP_BENCH1_OK
# floors set: top-30 sf1.0 walls from the fresh suite run + the drift
# watch items + both funnel audits + the round-19 graph-ANN family;
# guarded against an empty/missing set.
python3 - <<'PY'
import json
d = json.load(open('/tmp/BENCH_SF1_r19.json'))
top = sorted(d['queries'].items(), key=lambda kv: -kv[1])[:30]
names = {k for k, _ in top} | {"q248_srp_rerank", "q300_maxsim_retrieval",
  "q25_ngram_jaccard_blocked", "q341_simjoin_funnel", "q342_lshband_funnel",
  "q106_canonical_docs", "q306_survivor_bias", "q343_ann_graph_beam",
  "q345_graph_ann_audit", "q346_graph_beam_sweep", "q347_ml_simjoin_funnel",
  "q348_ml_lshband_funnel", "q349_graph_append_audit"}
open('/tmp/floors_set_r19.txt', 'w').write(",".join(sorted(names)))
PY
[ -s /tmp/floors_set_r19.txt ] || { echo MISSING_FLOORS_SET; exit 1; }
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1.0 \
  tools/run_graft.sh graft.Bench "$(cat /tmp/floors_set_r19.txt)" --reps 2 \
  > /tmp/bench_sf1_floors_r19.out 2>/tmp/bench_sf1_floors_r19.log
grep -F '"metric"' /tmp/bench_sf1_floors_r19.out | head -1 > /tmp/BENCH_SF1_r19_floors.json
[ -s /tmp/BENCH_SF1_r19_floors.json ] || { echo MISSING_FLOORS_OUT; exit 1; }
echo STEP_FLOORS_OK
export SPARK_GRAFT_CPUS=8
tools/run_graft.sh graft.tools.LintDump /root/testdata/sf0.1 /tmp/LINT_r19.json >/tmp/lint_r19.log 2>&1
[ -s /tmp/LINT_r19.json ] || { echo MISSING_LINT_OUT; exit 1; }
echo STEP_LINT_OK
cp /tmp/BENCH_r19_floors.json /tmp/BENCH_SF1_r19.json /tmp/BENCH_SF1_r19_floors.json /tmp/LINT_r19.json /root/repo/
python3 tools/scaling_audit.py BENCH_r19_floors.json BENCH_SF1_r19.json BENCH_SF1_r19_floors.json > /tmp/SCALING_r19.json
python3 -c "import json; json.load(open('/tmp/SCALING_r19.json'))" \
  || { echo SCALING_NOT_JSON; exit 1; }
[ -s /tmp/SCALING_r19.json ] || { echo MISSING_SCALING_OUT; exit 1; }
cp /tmp/SCALING_r19.json /root/repo/SCALING_r19.json
echo STEP_SCALING_OK
cp /tmp/sc_sf01_r19.txt SELFCHECK_SF01_r19.txt
cp /tmp/sc_sf1_r19.txt SELFCHECK_SF1_r19.txt
python3 tools/sync_test_counts.py /tmp/sbt_test_r19.log || true
echo FINAL_CHAIN_DONE
