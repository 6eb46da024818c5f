#!/bin/bash
# Bare-java probe launcher: sbt holds a project-level lock, so long
# probes run via java directly. Carries the full JDK17 add-opens list
# (Spark 4 Kryo HeapByteBuffer paths die mid-stream without it — the
# r18 checkpoint lesson). Usage:
#   SPARK_DRIVER_MEM=100g tools/run_probe.sh graft.tools.SemStreamScale target/sf100 1000 8 flat 32000
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
