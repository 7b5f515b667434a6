#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars,
# without sbt in the loop. Usage: tools/run.sh graft.Bench [args...]
# Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR, SPARK_DRIVER_MEM
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GCLockerRetryAllocationCount: JDK 17 G1 spuriously OOMs tiny
# allocations when tasks in JNI critical sections starve the GCLocker
# (seen on 10^8-row cache builds); gone in JDK 21 (JDK-8308341).
exec java $ADD_OPENS $SPARK_GRAFT_JAVA_OPTS \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -XX:+UnlockDiagnosticVMOptions \
  -XX:GCLockerRetryAllocationCount=64 \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" \
  "$@"
