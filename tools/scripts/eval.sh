#!/usr/bin/env bash
# Single-host evaluation (all local TPU chips form the 'data' mesh axis).
# Reference counterpart: tools/scripts/eval.sh (torchrun 1x8) — on TPU no
# launcher is needed; jax enumerates local chips.
# Cross-dataset generalization: pass --eval_data_cfg_file cfgs/<ds>_eval.yaml.
set -euo pipefail
CFG=${1:?usage: eval.sh <cfg_file> [extra args...]}
shift || true
python tools/eval.py --cfg_file "$CFG" "$@"
