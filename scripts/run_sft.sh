#!/usr/bin/env bash
# SFT launcher (reference scripts/run_sft.sh: 8-way sharded, Hydra
# configs/sft.yaml). Overrides use dotted keys, e.g.:
#   scripts/run_sft.sh training.lr=1e-5 mesh.fsdp=8
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m aki_tpu.train.sft --config aki_tpu/configs/sft.yaml "$@"
