#!/bin/bash
# Multi-host TPU pod-slice training (replaces the reference's PBS/SLURM
# single-node DDP jobs, scripts/rcs_parallel_job.pbs / slurm_job.sh).
#
# Launch once per host, e.g. with `gcloud compute tpus tpu-vm ssh --worker=all`:
#   COORDINATOR=<host0-ip>:8476 NUM_PROCESSES=<hosts> PROCESS_ID=<this-host> \
#     bash scripts/tpu_pod_job.sh
set -e
cd "$(dirname "$0")/.."

python parallel_main.py configs/uncertainty.yml da-vinci \
    --epochs 120 \
    --batch-size "${GLOBAL_BATCH:-64}" \
    --learning-rate 2e-4 \
    --coordinator-address "${COORDINATOR:?set COORDINATOR=host:port}" \
    --num-processes "${NUM_PROCESSES:?set NUM_PROCESSES}" \
    --process-id "${PROCESS_ID:?set PROCESS_ID}" \
    --save-model-every 10 \
    --evaluate-every 10 \
    --save-model-to trained \
    --save-results-to results \
    "$@"
