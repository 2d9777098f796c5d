#!/bin/bash
# N vs 4N scaling evidence with per-config JVM sizing: each side runs in
# its own JVM whose ActiveProcessorCount matches its core budget, so GC
# and JIT thread pools are sized like a real machine of that size.
# Usage: tools/scaling_run.sh [baseCores] [nAssign] [nPipeline] [rounds]
set -e
BASE=${1:-2}; NA=${2:-12000000}; NP=${3:-3000000}; R=${4:-4}
cd "$(dirname "$0")/.."
for mode in n 4n; do
  procs=$BASE; [ "$mode" = "4n" ] && procs=$((BASE * 4))
  SPARK_ACTIVE_PROCS=$procs SPARK_GRAFT_BASE_CORES=$BASE SPARK_DRIVER_MEM=16g \
    sbt -batch "runMain graft.ScalingBench $NA $NP $R $mode" 2>&1 \
    | grep -E '^\[info\] \{' | sed 's/^\[info\] //'
done
