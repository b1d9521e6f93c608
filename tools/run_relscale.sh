#!/bin/bash
# sf100 heavy-relational drive recipe (EXPERIMENTS.md "r15 heavy
# relational band"). Fixture first (one-time, ~17 min, 22 GB):
#
#   SPARK_GRAFT_CPUS=32 java -Xmx96g $OPENS \
#     -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.GenData \
#     /tmp/sf10 /tmp/sf100 10 "region,nation,customer,supplier,part,orders,lineitem,events"
#
# Then this script: ONE key+mode per JVM — a single q9 leg leaves ~30 GB
# of shuffle files that only die with the process, so co-resident legs
# ENOSPC on this box. Legs dump sorted rows to /tmp/relscale/<key>.<mode>.tsv;
# the second plan leg of each alt-plan key compares against the first.
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd "$(dirname "$0")/.."
mkdir -p /tmp/relscale
for LEG in "q9 default" "q9 alt" "q18 default" "q18 alt" "q21 default" "q13 default" "outer default" "nullskew default" "nullskew alt" "zipf default" "salted default" "winrun default" "winlag default" "sess default" "rollup default" "gsets default"; do
  set -- $LEG
  echo "--- leg: $1 $2 ($(date +%H:%M:%S), free $(df -h / | awk 'NR==2{print $4}'))"
  SPARK_GRAFT_CPUS=32 java -Xmx96g $OPENS -Dio.netty.tryReflectionSetAccessible=true \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.RelationalScaleExperiment /tmp/sf100 /tmp/sf10 "$1" "$2" 2>&1 | grep -vE "^26/|^\s+at |^Using"
done
echo "ALL LEGS DONE"
