#!/usr/bin/env bash
# Package the engine and launch a job via spark-submit --py-files
# (north rule launch path). Works unchanged against a real cluster:
#   tools/submit.sh --master spark://head:7077 tools/crawl_job.py --help
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f /tmp/crawler_spark.zip
zip -qr /tmp/crawler_spark.zip crawler_spark -x '*__pycache__*'
exec spark-submit --py-files /tmp/crawler_spark.zip "$@"
