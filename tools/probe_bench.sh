#!/bin/bash
# Probe runner: times a query subset on one or more data dirs with the
# Bench main (min-over-passes, interleaved), one fresh JVM per dir.
#   tools/probe_bench.sh "<comma query list>" <passes> <dir> [<dir> ...]
# Prints one JSON line per dir. Requires compiled classes (sbt compile).
set -euo pipefail
QUERIES="$1"; PASSES="$2"; shift 2
ADD_OPENS=$(printf -- "--add-opens=java.base/%s=ALL-UNNAMED " \
  java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch \
  sun.nio.cs sun.security.action sun.util.calendar)
for DIR in "$@"; do
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_PASSES="$PASSES" \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $ADD_OPENS \
    -Xmx100g graft.Bench 2>/dev/null | grep '^{"metric":"total"'
done
