#!/bin/bash
# Data-parallel smoke test including the adversarial branch (reference
# scripts/parallel_test.sh).  Runs over an 8-virtual-device CPU mesh — a
# strictly stronger test than the reference's world-size-1 NCCL trick.
set -e
cd "$(dirname "$0")/.."

XLA_FLAGS="${XLA_FLAGS} --xla_force_host_platform_device_count=8" \
python parallel_main.py configs/uncertainty.yml da-vinci \
    --platform cpu \
    --epochs 2 \
    --training-size 16 \
    --validation-size 16 \
    --batch-size 8 \
    --adversarial \
    --save-model-every 1 \
    --evaluate-every 1 \
    --save-model-to trained \
    --save-results-to results \
    --no-pbar \
    "$@"
