#!/bin/bash
# Fast main-class runner: compiled classes + /opt/spark/jars, no sbt startup.
# Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -e
DIR="$(cd "$(dirname "$0")/.." && pwd)"
CP="$DIR/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# 512m code cache: the full bench suite's codegen classes overflow the
# JDK-17 default 240m, disabling C2 mid-suite (uniform ~2.4x inflation).
exec java $OPENS -Xmx${GRAFT_MEM:-12g} -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dfile.encoding=UTF-8 \
  -cp "$CP" "$@"
