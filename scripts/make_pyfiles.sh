#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/linkgraph.zip
zip -qr dist/linkgraph.zip linkgraph -x '*__pycache__*'
echo "dist/linkgraph.zip"
