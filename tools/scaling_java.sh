#!/bin/bash
# Same protocol as scaling_run.sh but launched with plain `java` against
# a snapshotted classes dir (SCALING_CP) so it can run while sbt
# recompiles the tree. JVM flags mirror build.sbt's javaOptions.
set -e
BASE=${1:-2}; NA=${2:-24000000}; NP=${3:-6000000}; R=${4:-2}
CP="${SCALING_CP:-target/scala-2.13/classes}:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"; done
for mode in n 4n; do
  procs=$BASE; [ "$mode" = "4n" ] && procs=$((BASE * 4))
  SPARK_GRAFT_BASE_CORES=$BASE java -Xmx${SPARK_DRIVER_MEM:-16g} \
    -XX:ActiveProcessorCount=$procs ${SPARK_GC:+-XX:+Use${SPARK_GC}GC} $AO \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.ScalingBench $NA $NP $R $mode 2>/dev/null | grep '^{'
done
