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
# (seen on 10^8-row cache builds); the GCLocker is removed in JDK 22+
# (JDK-8308341) where the unrecognized flag would abort startup — gate
# on the detected major version.
JAVA_MAJOR=$(java -version 2>&1 | sed -n 's/.*version "\([0-9][0-9]*\).*/\1/p' | head -1)
GC_FLAGS=""
if [ "${JAVA_MAJOR:-17}" -le 21 ]; then
  GC_FLAGS="-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64"
fi
exec java $ADD_OPENS $GC_FLAGS $SPARK_GRAFT_JAVA_OPTS \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" \
  "$@"
