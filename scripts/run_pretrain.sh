#!/usr/bin/env bash
# Pre-training launcher (reference scripts/run_train.sh:1-34 envelope:
# blip3_kale shards, amp_bf16, FSDP, wd 0.01, warmup 2000, cosine).
# On TPU pods, run once per host; jax.distributed discovers topology.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m aki_tpu.train.pretrain --config aki_tpu/configs/pretrain.yaml "$@"
