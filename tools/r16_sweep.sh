#!/bin/bash
# Round-16 close gate: full suite + 4-config Verify/selfcheck sweep.
# Sequential on purpose — sbt is single-instance per project dir.
set -u
cd /root/repo
echo "== sbt test =="
sbt -batch test > /tmp/r16_close_test.log 2>&1
grep -E "Tests: succeeded|All tests passed" /tmp/r16_close_test.log | tail -2

run_cfg () {
  local tag=$1 sf=$2; shift 2
  echo "== verify $tag =="
  env "$@" sbt -batch "runMain graft.Verify $sf /tmp/r16_sweep_$tag" \
    > /tmp/r16_sweep_${tag}_verify.log 2>&1
  grep -cE "\[verify\].*failed" /tmp/r16_sweep_${tag}_verify.log
  python3 tools/selfcheck.py "$sf" /tmp/r16_sweep_$tag \
    > /tmp/r16_sweep_${tag}_check.log 2>&1
  tail -1 /tmp/r16_sweep_${tag}_check.log
}

run_cfg sf0001 /root/testdata/sf0.001
run_cfg sf001  /root/testdata/sf0.01
run_cfg sf001c7 /root/testdata/sf0.01 SPARK_GRAFT_CPUS=7
run_cfg sf01   /root/testdata/sf0.1
echo "== sweep done =="
