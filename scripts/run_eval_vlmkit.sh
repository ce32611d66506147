#!/usr/bin/env bash
# VLMEvalKit launcher (reference scripts/run_eval_vlmkit.sh). If vlmeval
# is installed, registers aki_tpu.infer.vlmevalkit.AKIVLMEval into its
# runtime registry as model "AKI" and delegates (vlmeval is NOT in this
# image, so that branch is best-effort); otherwise falls back to the JSONL
# batch predictor for harnesses that feed prompts/images as files.
set -euo pipefail
cd "$(dirname "$0")/.."
if python -c "import vlmeval" 2>/dev/null; then
  exec python - "$@" <<'PY'
import sys
from functools import partial
import vlmeval.config as vconf
from aki_tpu.infer.vlmevalkit import AKIVLMEval
vconf.supported_VLM["AKI"] = partial(AKIVLMEval)
import runpy
sys.argv = ["vlmeval.run", "--model", "AKI", *sys.argv[1:]]
runpy.run_module("vlmeval.run", run_name="__main__")
PY
fi
echo "vlmeval not installed; using the JSONL batch predictor" >&2
exec python -m aki_tpu.infer.predict "$@"
