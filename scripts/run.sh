#!/usr/bin/env bash
# Run a graft main class directly against the compiled classes (no sbt JVM
# spin-up). Usage: scripts/run.sh graft.Verify /root/testdata/sf0.01 /tmp/out
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Duser.timezone=UTC \
  -Dderby.stream.error.file=/tmp/derby.log \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  "$@"
