#!/bin/bash
# Serial smoke test on CPU devices (reference scripts/local_test.sh):
# full train+eval path, 16-sample subsets, 2 epochs.
set -e
cd "$(dirname "$0")/.."

python main.py configs/uncertainty.yml da-vinci \
    --platform cpu \
    --epochs 2 \
    --training-size 16 \
    --validation-size 16 \
    --batch-size 8 \
    --save-model-every 1 \
    --evaluate-every 1 \
    --save-model-to trained \
    --save-results-to results \
    --no-pbar \
    "$@"
