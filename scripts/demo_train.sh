#!/bin/bash
# Full production training recipe (reference scripts/demo_train.sh):
# batch 8, 120 epochs, lr 1e-4 at 256x512 on the available TPU chips.
set -e
cd "$(dirname "$0")/.."

python main.py configs/uncertainty.yml da-vinci \
    --epochs 120 \
    --batch-size 8 \
    --learning-rate 1e-4 \
    --save-model-every 10 \
    --evaluate-every 10 \
    --save-model-to trained \
    --save-results-to results \
    "$@"
