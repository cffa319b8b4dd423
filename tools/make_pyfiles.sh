#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule deployment).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/lkg_spark.zip
zip -qr dist/lkg_spark.zip legal_knowledge_graph_spark -x '*__pycache__*'
echo "dist/lkg_spark.zip"
