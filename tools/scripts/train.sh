#!/usr/bin/env bash
# Single-host training (all local TPU chips form the 'data' mesh axis).
# Reference counterpart: tools/scripts/train.sh (torchrun 1x8) — on TPU no
# launcher is needed; jax enumerates local chips.
set -euo pipefail
CFG=${1:?usage: train.sh <cfg_file> [extra args...]}
shift || true
python tools/train.py --cfg_file "$CFG" "$@"
