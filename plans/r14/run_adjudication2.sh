#!/bin/bash
cd /root/repo
for cfg in "32 64k" "32 1m" "8 64k" "8 1m"; do
  set -- $cfg
  echo "=== bench cpus=$1 minPartitionSize=$2 $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$1 \
  SPARK_GRAFT_MIN_PARTITION_SIZE=$2 SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch "runMain graft.Bench" > plans/r14/bench2_c$1_$2.log 2>&1
  cp BENCH_FULL_LAST.json plans/r14/bench2_full_c$1_$2.json
  echo "=== done cpus=$1 size=$2 $(date +%T) ==="
done
echo ALL_DONE
