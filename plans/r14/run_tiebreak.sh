#!/bin/bash
cd /root/repo
for f in 64k 1m; do
  echo "=== bench cpus=32 minPartitionSize=$f $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_MIN_PARTITION_SIZE=$f SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch "runMain graft.Bench" > plans/r14/bench3_c32_$f.log 2>&1
  cp BENCH_FULL_LAST.json plans/r14/bench3_full_c32_$f.json
  echo "=== done $f $(date +%T) ==="
done
echo ALL_DONE
