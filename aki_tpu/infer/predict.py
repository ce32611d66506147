"""Batch prediction CLI — the external-eval-harness adapter.

The reference delegates most benchmarks to VLMEvalKit
(``scripts/run_eval_vlmkit.sh``), which just needs (image, prompt) ->
answer.  This CLI reads a JSONL of requests, drives the continuous-batching
server, and writes a JSONL of answers — any harness (VLMEvalKit-style) can
shell out to it.

Input lines:  {"image": "path.jpg", "question": "...", "id": optional}
Output lines: {"id": ..., "answer": "..."}

Usage:
    python -m aki_tpu.infer.predict --checkpoint runs/imported \
        --input requests.jsonl --output answers.jsonl \
        [--tokenizer /models/phi-3.5-mini] [--slots 8]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..data.images import decode_image, preprocess
from ..data.sft.templates import SYSTEM_MESSAGE
from ..models.modeling import AKIModel
from .server import ServingEngine


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--prompt-bucket", type=int, default=512)
    ap.add_argument("--attn-mode", default=None,
                    choices=("mma", "dot", "causal"),
                    help="prefill attention ablation (README.md:81-87)")
    args = ap.parse_args(argv)

    model = AKIModel.from_pretrained(
        args.checkpoint, tokenizer_path=args.tokenizer, tiny=args.tiny
    )
    engine = ServingEngine(
        model.params, model.cfg, num_slots=args.slots, max_len=args.max_len,
        prompt_bucket=args.prompt_bucket, policy=model.policy,
        attn_mode=args.attn_mode,
    )
    tok = model.tokenizer

    requests = [json.loads(l) for l in Path(args.input).read_text().splitlines() if l.strip()]
    pending = []
    for i, r in enumerate(requests):
        prompt = (
            f"<s> <|system|>\n{SYSTEM_MESSAGE}<|end|>\n<|user|>\n<image>\n"
            f"{r['question']}<|end|>\n<|assistant|>\n"
        )
        ids = tok.encode(prompt)  # reference eval/demo: add_special_tokens=False (eval.py:81)
        img = preprocess(
            decode_image(Path(r["image"]).read_bytes()),
            model.cfg.siglip.image_size,
        )
        req = engine.submit(ids, img, max_new_tokens=args.max_new_tokens,
                            eos_id=tok.info.end_id)
        pending.append((r.get("id", i), req))

    engine.run_until_drained()

    with Path(args.output).open("w") as f:
        for rid, req in pending:
            tokens = req.result(timeout=1)
            f.write(json.dumps({
                "id": rid, "answer": tok.decode(np.asarray(tokens)),
            }) + "\n")
    print(f"wrote {len(pending)} answers -> {args.output}")


if __name__ == "__main__":
    main()
