#!/bin/sh
# Build the --py-files artifact for spark-submit (BASELINE.json:14).
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip nifi_daffodil_spark -x '*__pycache__*'
echo "engine.zip: $(du -h engine.zip | cut -f1)"
echo "submit: spark-submit --py-files engine.zip jobs/run_cdc.py --help"
