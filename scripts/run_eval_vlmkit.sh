#!/usr/bin/env bash
# VLMEvalKit launcher (reference scripts/run_eval_vlmkit.sh). If vlmeval
# is installed, registers aki_tpu.infer.vlmevalkit.AKIVLMEval into its
# runtime registry as model "AKI" and delegates (vlmeval is NOT in this
# image, so that branch is best-effort); otherwise falls back to the JSONL
# batch predictor for harnesses that feed prompts/images as files.
set -euo pipefail
cd "$(dirname "$0")/.."
# Registry layout check: written against VLMEvalKit >= 0.2 (the
# vlmeval.config.supported_VLM dict + vlmeval.run module entry point).
# Probe both before delegating so a layout change in a future vlmeval
# fails loudly here instead of deep inside runpy.
if python -c "
import importlib.util as u, vlmeval.config as c
assert isinstance(getattr(c, 'supported_VLM', None), dict), 'no supported_VLM dict'
assert u.find_spec('vlmeval.run') is not None, 'no vlmeval.run module'
" 2>/dev/null; then
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
elif python -c "import vlmeval" 2>/dev/null; then
  echo "ERROR: vlmeval is installed but its registry layout is not the" >&2
  echo "supported_VLM/vlmeval.run shape this launcher targets (>=0.2)." >&2
  echo "Adapt scripts/run_eval_vlmkit.sh to the installed version." >&2
  exit 2
fi
echo "vlmeval not installed; using the JSONL batch predictor" >&2
exec python -m aki_tpu.infer.predict "$@"
