#!/usr/bin/env bash
# Local web demo (reference local_demo.py, gradio replaced by a stdlib
# server): point it at a converted checkpoint directory.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m aki_tpu.infer.demo "$@"
