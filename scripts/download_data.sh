#!/usr/bin/env bash
# COCO images (reference tools/download_data.sh) — only needed for
# visualization / new feature extraction, not for training (the pipeline
# consumes precomputed bottom-up-attention region features).
set -euo pipefail

DATA=${1:-data_vqa/images}
mkdir -p "$DATA"

for f in train2014 val2014 test2015; do
    wget -nc -P "$DATA" "http://images.cocodataset.org/zips/${f}.zip"
    unzip -n "$DATA/${f}.zip" -d "$DATA"
done
