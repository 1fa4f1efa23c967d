#!/usr/bin/env bash
# Preprocessing pipeline (reference tools/process.sh): dictionary + GloVe
# init, soft-score targets, TSV -> HDF5 feature conversion.
set -euo pipefail

DATA=${1:-data_vqa}

python -m vqatpu.tools.create_dictionary --dataroot "$DATA"
python -m vqatpu.tools.compute_softscore --dataroot "$DATA"
python -m vqatpu.tools.feature_converter --split train --tsv "$DATA"/trainval/*.tsv --out "$DATA"
python -m vqatpu.tools.create_embedding --dataroot "$DATA" --kind gru
