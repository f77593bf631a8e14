#!/bin/bash
# Run a graft main class directly against compiled classes (faster than
# sbt runMain for the edit-compile-verify loop). Usage:
#   tools/run_class.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -euo pipefail
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS ${GRAFT_EXTRA_JAVA_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
