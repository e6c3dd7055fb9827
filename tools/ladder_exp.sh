#!/bin/bash
# Ladder-investigation runner: ScaleSmoke from a CLASS SNAPSHOT via plain
# java, so dev sbt compiles can't skew a running experiment.
# Usage: ladder_exp.sh <tag> [extra java opts...]
set -u
TAG="$1"; shift
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
SPARK_GRAFT_SCALE_ORDER=ladder_last SPARK_GRAFT_SCALE_DIAG=1 \
SPARK_GRAFT_SCALE_RETRIES=0 SPARK_GRAFT_SCALE_OUT="target/SCALE_DIAG_${TAG}.json" \
java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx4g -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  "$@" \
  -cp "target/classes_ladder_snap:/opt/spark/jars/*" \
  graft.ScaleSmoke /root/testdata/sf0.1 > "target/diag_${TAG}.log" 2>&1
echo "run ${TAG} exit=$?"
