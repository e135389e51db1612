#!/bin/bash
# Round-16 close-out chain: full suite, three-scale sweeps, benches,
# lint — sequential under one gate hold, quiet machine. Dev tool only.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=8
sbt -batch test > /tmp/sbt_test_r16b.log 2>&1 || { echo TEST_FAILED; exit 1; }
echo STEP_TEST_OK
tools/run_graft.sh graft.Verify /root/testdata/sf0.01 /tmp/v_sf001_f >/tmp/verify_sf001_f.log 2>&1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/v_sf001_f > /tmp/sc_sf001_f.txt 2>&1 || true
echo STEP_SF001_OK
tools/run_graft.sh graft.Verify /root/testdata/sf0.1 /tmp/v_sf01_f >/tmp/verify_sf01_f.log 2>&1
python3 tools/selfcheck.py /root/testdata/sf0.1 /tmp/v_sf01_f > /tmp/sc_sf01_f.txt 2>&1 || true
echo STEP_SF01_OK
tools/run_graft.sh graft.Verify /root/repo/target/sf1.0 /tmp/v_sf1_f >/tmp/verify_sf1_f.log 2>&1
SELFCHECK_ORACLE_TIMEOUT=300 python3 tools/selfcheck.py /root/repo/target/sf1.0 /tmp/v_sf1_f > /tmp/sc_sf1_f.txt 2>&1 || true
echo STEP_SF1_OK
export SPARK_GRAFT_CPUS=32
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 tools/run_graft.sh graft.Bench 2>/tmp/bench_sf01_f.log | grep -F '"metric"' | head -1 > /tmp/BENCH_r16_floors_f.json
echo STEP_BENCH01_OK
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1.0 SPARK_GRAFT_BENCH_REPS=1 tools/run_graft.sh graft.Bench 2>/tmp/bench_sf1_f.log | grep -F '"metric"' | head -1 > /tmp/BENCH_SF1_f.json
echo STEP_BENCH1_OK
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1.0 tools/run_graft.sh graft.Bench "$(cat /tmp/floors_set.txt)" --reps 2 2>/tmp/bench_sf1_floors_f.log | grep -F '"metric"' | head -1 > /tmp/BENCH_SF1_floors_f.json
echo STEP_FLOORS_OK
export SPARK_GRAFT_CPUS=8
tools/run_graft.sh graft.tools.LintDump /root/testdata/sf0.1 /tmp/LINT_r16_f.json >/tmp/lint_f.log 2>&1
echo STEP_LINT_OK
echo FINAL_CHAIN_DONE
