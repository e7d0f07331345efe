#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule: "runs via
# spark-submit --py-files on multi-executor clusters").
#
#   scripts/package_pyfiles.sh [out.zip]
#
# Produces a zip importable on every executor: spark-submit \
#   --py-files dist/search_spark.zip scripts/submit_build.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist/search_spark.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
# -x: no caches; the package is pure Python, nothing to build
zip -qr "$OUT" search_spark -x '*__pycache__*'
echo "$OUT"
