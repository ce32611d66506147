#!/usr/bin/env bash
# VLMEvalKit launcher (reference scripts/run_eval_vlmkit.sh): registers
# aki_tpu.infer.vlmevalkit.AKIVLMEval as model "AKI" then delegates to the
# external harness if installed; otherwise falls back to the JSONL batch
# predictor for harnesses that feed prompts/images as files.
set -euo pipefail
cd "$(dirname "$0")/.."
if python -c "import vlmeval" 2>/dev/null; then
  exec python -m vlmeval.run --model AKI "$@"
fi
echo "vlmeval not installed; using the JSONL batch predictor" >&2
exec python -m aki_tpu.infer.predict "$@"
