#!/bin/bash
# Finetune/restore smoke test (reference scripts/finetune_test.sh):
# restores a checkpoint (orbax dir or reference .pt) and trains 2 epochs.
set -e
cd "$(dirname "$0")/.."

CHECKPOINT="${1:-trained/davinci/l1/final}"
shift || true

python main.py configs/uncertainty.yml da-vinci \
    --platform cpu \
    --epochs 2 \
    --training-size 16 \
    --validation-size 16 \
    --batch-size 8 \
    --finetune-from "$CHECKPOINT" \
    --evaluate-every 1 \
    --no-pbar \
    "$@"
