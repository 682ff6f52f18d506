#!/usr/bin/env bash
# Run a graft main class directly against the compiled classes + the
# /opt/spark jars — for bench/scale harnesses when sbt is busy (the
# test suite holds the project lock) or when JVM startup should be
# bare. Usage:
#   scripts/run_main.sh [-Xmx...] graft.SomeMain [args...]
# Env (SPARK_GRAFT_*) passes through to the main.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
XMX="-Xmx24g"
if [[ "${1:-}" == -Xmx* ]]; then XMX="$1"; shift; fi
exec java "$XMX" \
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
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
