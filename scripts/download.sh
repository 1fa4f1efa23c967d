#!/usr/bin/env bash
# Dataset/artifact downloads (reference tools/download.sh + README links).
# Everything lands in data_vqa/, data_TDIUC/, data_v7w/ exactly where the
# datasets expect it.
set -euo pipefail

DATA=${1:-data_vqa}
mkdir -p "$DATA" "$DATA/glove" "$DATA/cache"

# GloVe 6B vectors
wget -nc -P "$DATA/glove" http://nlp.stanford.edu/data/glove.6B.zip
unzip -n "$DATA/glove/glove.6B.zip" -d "$DATA/glove"

# VQA-2.0 questions + annotations
for f in v2_Questions_Train_mscoco v2_Questions_Val_mscoco v2_Questions_Test_mscoco \
         v2_Annotations_Train_mscoco v2_Annotations_Val_mscoco; do
    wget -nc -P "$DATA" "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/${f}.zip"
    unzip -n "$DATA/${f}.zip" -d "$DATA"
done

# Bottom-up-attention features (adaptive 10-100 boxes)
wget -nc -P "$DATA" https://imagecaption.blob.core.windows.net/imagecaption/trainval.zip
unzip -n "$DATA/trainval.zip" -d "$DATA"

echo "Preprocessed packs for TDIUC/Visual7W and CTI teacher logits:"
echo "  see the reference release: https://vision.aioz.io/d/965325537ca642a3a822/"
echo "  teacher logits:            https://vision.aioz.io/d/9951e206d5ae4c4a97a1/"
