#!/usr/bin/env bash
# Launch the crawl job the way a cluster deployment would:
#   spark-submit --py-files dist/minicrawler_spark.zip
#
#   scripts/submit.sh [--master local[8]] -- <crawl_job args...>
#
# Example:
#   scripts/submit.sh --master local[8] -- \
#     --seeds /tmp/seeds.txt --output /tmp/crawl_out \
#     --extract-links --dedup --respect-robots --timeout 600
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="local[8]"
ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    --) shift; ARGS=("$@"); break ;;
    *) echo "unknown arg before --: $1" >&2; exit 2 ;;
  esac
done

python tools_package.py
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files dist/minicrawler_spark.zip \
  minicrawler_spark/jobs/crawl_job.py "${ARGS[@]}"
