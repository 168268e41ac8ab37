#!/usr/bin/env bash
# Package kgx/ for spark-submit --py-files execution on a multi-executor
# cluster (BASELINE.json:north_rule packaging requirement).
#
#   tools/package.sh            # -> dist/kgx.zip
#   spark-submit --py-files dist/kgx.zip kgx/pipeline.py \
#       --pages s3://bucket/pages --out s3://bucket/triples \
#       --buckets 4096 --groups 64
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kgx.zip
zip -qr dist/kgx.zip kgx -x 'kgx/__pycache__/*' -x 'kgx/*/__pycache__/*'
echo "wrote dist/kgx.zip ($(du -h dist/kgx.zip | cut -f1))"
