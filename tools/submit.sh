#!/usr/bin/env bash
# Package the engine and launch a crawl via spark-submit --py-files
# (north_rule: "run via spark-submit --py-files on a multi-executor
# cluster"). Usage:
#   tools/submit.sh [spark-submit args...] -- [crawl_job args...]
# e.g.
#   tools/submit.sh --master yarn --num-executors 200 \
#       --conf spark.sql.shuffle.partitions=1600 -- \
#       --corpus iceberg.crawl.pages --ckpt hdfs:///crawl/ckpt --waves 50
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/ieps_crawler_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" ieps_crawler_spark -x '*__pycache__*')

SUBMIT_ARGS=()
JOB_ARGS=()
seen_sep=0
for a in "$@"; do
  if [[ "$a" == "--" ]]; then seen_sep=1; continue; fi
  if [[ $seen_sep == 0 ]]; then SUBMIT_ARGS+=("$a"); else JOB_ARGS+=("$a"); fi
done

exec spark-submit \
  --py-files "$ZIP" \
  "${SUBMIT_ARGS[@]}" \
  "$REPO/tools/crawl_job.py" \
  "${JOB_ARGS[@]}"
