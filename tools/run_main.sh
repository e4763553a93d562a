#!/bin/bash
# Launch a graft main directly on the compiled classes — bypasses sbt
# so long probes / data generation can run while sbt holds the project
# lock (tests). Mirrors build.sbt's forked-run JVM flags.
# Usage: tools/run_main.sh graft.tools.StressGen /tmp/stress/sf1000emb 1000 embonly
set -euo pipefail
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java $OPENS ${EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
  "$@"
