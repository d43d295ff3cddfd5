#!/bin/bash
# Direct-JVM Bench launcher (builder-side): runs graft.Bench from the
# compiled classes without sbt — no build-tool startup inside the timing
# window and no sbt target-lock contention with a concurrent test run.
# Same JVM options build.sbt's `run / fork` applies (JDK-17 add-opens +
# driver heap), so timings are comparable with sbt-launched sweeps.
#
# Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_ONLY=...] [SPARK_GRAFT_SETS=...]
#        [SPARK_GRAFT_INDEX_DIR=...] tools/bench_direct.sh [main-class]
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CLASSES=$(ls -d "$REPO"/target/scala-*/classes 2>/dev/null | head -1)
if [ -z "$CLASSES" ]; then
  echo "bench_direct.sh: no compiled classes under $REPO/target — run sbt compile first" >&2
  exit 1
fi
MAIN="${1:-graft.Bench}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# SPARK_GRAFT_EXTRA_JAVA_OPTS: ad-hoc -D flags for an experiment (e.g.
# -Dspark.io.compression.codec=zstd to shrink a disk-bounded shuffle).
# SPARK_SCALA_VERSION: local-cluster workers build the executor command
# through AbstractCommandBuilder.getScalaVersion, which dies with
# "Cannot find any build directories" on a dist-layout SPARK_HOME
# unless the version is pinned in the environment.
export SPARK_SCALA_VERSION=2.13
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_GRAFT_EXTRA_JAVA_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$MAIN" "${@:2}"
