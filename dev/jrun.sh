#!/bin/bash
# Direct java -cp runner for graft mains (no sbt session overhead).
# Usage: jrun.sh [-Xmx...] <mainClass> [args...]
set -e
cd /root/repo
XMX="-Xmx8g"
if [[ "$1" == -Xmx* ]]; then XMX="$1"; shift; fi
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS $XMX -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" "$@"
