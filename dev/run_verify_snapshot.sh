#!/usr/bin/env bash
# Launch graft.Verify from a SNAPSHOT of the compiled classes, outside
# sbt — frees the sbt project lock (and decouples the run from concurrent
# recompiles) for long verification sweeps like the full-registry sf0.1
# oracle pass (r18 verdict ask #1).
#
# Usage: dev/run_verify_snapshot.sh <sfdir> <outdir> [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="$1"; OUT="$2"; CPUS="${3:-16}"
SNAP=/tmp/graft_classes_snapshot
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"
rm -rf "$OUT"
export SPARK_GRAFT_CPUS="$CPUS"
exec java -Xmx48g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Djava.awt.headless=true \
  -cp "$SNAP:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT"
