#!/bin/bash
cd /root/repo
for c in 32 8; do
  echo "=== close cpus=$c $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$c \
  SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch "runMain graft.Bench" > plans/r14/close_c$c.log 2>&1
  cp BENCH_FULL_LAST.json plans/r14/close_full_c$c.json
  echo "=== done cpus=$c $(date +%T) ==="
done
echo CLOSE_DONE
