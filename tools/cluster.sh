#!/usr/bin/env bash
# Start/stop a localhost Spark standalone cluster for multi-executor
# scaling runs (the sandbox stand-in for a real N/4N-executor cluster:
# separate executor JVMs, separate GC, separate Python worker pools,
# shuffle over localhost TCP).
#   tools/cluster.sh start   # master :7077 + 1 worker (32 cores, 96g)
#   tools/cluster.sh stop
set -euo pipefail
export SPARK_HOME=/opt/spark
export SPARK_MASTER_HOST=127.0.0.1

case "${1:-}" in
  start)
    "$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 \
      --webui-port 8090
    # one worker advertising all cores; executor sizing (spark.executor.
    # cores/memory + spark.cores.max) carves it into 1..4 executor JVMs
    "$SPARK_HOME/sbin/start-worker.sh" spark://127.0.0.1:7077 \
      --cores 32 --memory 96g --webui-port 8091
    ;;
  stop)
    "$SPARK_HOME/sbin/stop-worker.sh" || true
    "$SPARK_HOME/sbin/stop-master.sh" || true
    ;;
  *)
    echo "usage: $0 start|stop" >&2; exit 2;;
esac
