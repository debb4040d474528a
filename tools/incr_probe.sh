#!/usr/bin/env bash
# Plain-java launcher for graft.IncrProbe (same flags as tools/bench.sh).
# Usage: GRAFT_SCALE_B=/tmp/graft_scale/x25 tools/incr_probe.sh
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES" ] || \
   [ -n "$(find src/main -name '*.scala' -newer "$CLASSES" -print -quit 2>/dev/null)" ]; then
  sbt -batch compile 1>&2
fi
OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio
  java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs
  java.base/sun.security.action java.base/sun.util.calendar
)
OPEN_FLAGS=()
for p in "${OPENS[@]}"; do OPEN_FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java \
  "${OPEN_FLAGS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-48g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.IncrProbe
