#!/usr/bin/env bash
# Multi-host training on a TPU pod slice.
# Reference counterpart: tools/scripts/train_multinodes.sh (torchrun c10d
# rendezvous). On TPU pods, run this same command on every host; jax's
# distributed initialization picks coordinates from the TPU runtime
# (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID for
# manual bootstrap). Collectives ride ICI within the slice, DCN across.
set -euo pipefail
CFG=${1:?usage: train_multinodes.sh <cfg_file> [extra args...]}
shift || true
python tools/train.py --cfg_file "$CFG" --dist "$@"
