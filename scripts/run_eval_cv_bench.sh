#!/usr/bin/env bash
# CV-Bench evaluation (reference eval_cv_bench/eval.py): converted
# checkpoint dir + CV-Bench data root -> CSV + accuracy report.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m aki_tpu.infer.eval_cv_bench "$@"
