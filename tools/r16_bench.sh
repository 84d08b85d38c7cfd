#!/bin/bash
# Round-16 close bench: 3 full runs at sf0.1 (idle host, sequential),
# one sf0.001 run, then the median merge. Keep the host quiet while
# this runs — contention inflates timed entries (round-12 lesson).
set -u
cd /root/repo
for i in 1 2 3; do
  echo "== run $i =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    > /tmp/r16_bench_run$i.log 2>&1
  grep '"metric"' /tmp/r16_bench_run$i.log | sed 's/^\[info\] //' \
    > BENCH_r16_run$i.json
  python3 -c "import json;d=json.load(open('BENCH_r16_run$i.json'));print('run $i total', d['value'], 'failed', d['failed'])"
done
echo "== sf0.001 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt -batch "runMain graft.Bench" \
  > /tmp/r16_bench_sf0001.log 2>&1
grep '"metric"' /tmp/r16_bench_sf0001.log | sed 's/^\[info\] //' > BENCH_r16_sf001.json
python3 tools/benchmedian.py BENCH_r16_full.json BENCH_r16_run1.json BENCH_r16_run2.json BENCH_r16_run3.json
echo "== bench done =="
