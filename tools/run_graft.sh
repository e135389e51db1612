#!/bin/bash
# Run a graft main class directly against compiled classes + Spark
# jars, bypassing the sbt project lock (sbt's own lock would block a
# Verify while sbt test runs; the JVM-level conflict that actually
# matters — compiling while another JVM reads class files — is still
# on the operator: NEVER `sbt compile` while any graft JVM runs).
#
# Quick targeted checks may run this directly. Anything that is a
# GATE — a full Verify sweep, Bench, floors, anything whose output
# becomes a round artifact — must go through tools/gate.sh so gates
# are mutually exclusive:  tools/gate.sh tools/run_graft.sh graft.Bench
MAIN=$1; shift
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-48g} \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
