"""CV-Bench evaluation CLI.

Behavioral port of ``eval_cv_bench/eval.py``: loads the CV-Bench split
(HF datasets from a local path), renders the MCQ prompt with the chat
template, greedy-generates with the MMA prefill engine, exact-matches the
option letter, and reports accuracy split into 2D (ADE20K, COCO) and 3D
(Omni3D) sources plus a CSV of predictions.

Prompt (eval.py:54-64):
    <s> <|system|>\n{SYSTEM}<|end|>\n<|user|>\n<image>\n{question}
    {choices}\nAnswer with the option's letter from the given choices
    directly.<|end|>\n<|assistant|>\n

Usage:
    python -m aki_tpu.infer.eval_cv_bench --checkpoint runs/sft \
        --data /path/to/CV-Bench [--tokenizer /path/to/tok] [--limit N]
"""

from __future__ import annotations

import argparse
import csv
import re
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..data.images import preprocess
from ..data.sft.templates import SYSTEM_MESSAGE
from ..data.tokenizer import load_tokenizer
from ..models.aki import init_aki
from ..models.common import Policy
from ..models.configs import aki_4b, aki_tiny, config_for_tokenizer
from .engine import generate
import jax


def render_prompt(question: str, choices: list[str]) -> str:
    """MCQ prompt layout per eval.py:54-64 (choices already lettered)."""
    lettered = "\n".join(
        f"({chr(ord('A') + i)}) {c}" for i, c in enumerate(choices)
    )
    return (
        f"<|system|>\n{SYSTEM_MESSAGE}<|end|>\n"
        f"<|user|>\n<image>\n{question}\n{lettered}\n"
        "Answer with the option's letter from the given choices directly."
        f"<|end|>\n<|assistant|>\n"
    )


def extract_letter(text: str) -> str | None:
    m = re.search(r"\(?([A-F])\)?", text.strip())
    return m.group(1) if m else None


def load_params(checkpoint: str | None, cfg, seed=0):
    params = init_aki(jax.random.PRNGKey(seed), cfg, dtype=jnp.bfloat16)
    if checkpoint:
        from ..train.checkpoints import CheckpointManager
        from ..train.optim import make_optimizer
        from ..train.step import TrainState

        opt = make_optimizer(params, 1e-4)
        state = TrainState.create(params, opt)
        mgr = CheckpointManager(checkpoint)
        state, _ = mgr.restore(state)
        params = state.params
    return params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data", required=True,
                    help="local CV-Bench dir (HF datasets format or parquet)")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--out", default="cv_bench_results")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    args = ap.parse_args(argv)

    tokenizer = load_tokenizer(args.tokenizer)
    base = aki_tiny(tokenizer.info.vocab_size) if args.tiny else aki_4b()
    cfg = config_for_tokenizer(base, tokenizer.info)
    params = load_params(args.checkpoint, cfg)
    policy = Policy(param_dtype=jnp.bfloat16)

    import datasets as hfds

    ds = hfds.load_dataset(args.data, split="test")
    if args.limit:
        ds = ds.select(range(min(args.limit, len(ds))))

    results = []
    correct_by_source: dict[str, list[int]] = {}
    img_size = cfg.siglip.image_size
    max_len = 1024

    for i, ex in enumerate(ds):
        prompt = render_prompt(ex["question"], ex["choices"])
        ids = tokenizer.encode(prompt)  # reference eval/demo: add_special_tokens=False (eval.py:81)
        img = preprocess(ex["image"], img_size)
        input_ids = jnp.array([ids], jnp.int32)
        valid = jnp.ones_like(input_ids)
        imgs = jnp.array(img[None])

        tokens, num = generate(
            params, cfg, input_ids, imgs, valid,
            max_new_tokens=args.max_new_tokens, max_len=max_len,
            eos_id=tokenizer.info.end_id, policy=policy,
        )
        text = tokenizer.decode(np.asarray(tokens)[0][: int(num[0])])
        pred = extract_letter(text)
        gold = extract_letter(ex["answer"])
        ok = int(pred == gold)
        src = ex.get("source", "unknown")
        correct_by_source.setdefault(src, []).append(ok)
        results.append({
            "idx": i, "source": src, "pred": pred, "gold": gold,
            "correct": ok, "raw": text[:200],
        })

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    with (out / "predictions.csv").open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        w.writeheader()
        w.writerows(results)

    # 2D = ADE20K + COCO, 3D = Omni3D (eval.py:119-153)
    def acc(sources):
        vals = [v for s in sources for v in correct_by_source.get(s, [])]
        return 100.0 * np.mean(vals) if vals else float("nan")

    acc2d = acc(["ADE20K", "COCO"])
    acc3d = acc(["Omni3D"])
    report = (
        f"CV-Bench 2D accuracy: {acc2d:.2f}\n"
        f"CV-Bench 3D accuracy: {acc3d:.2f}\n"
        f"overall: {100.0 * np.mean([r['correct'] for r in results]):.2f}\n"
    )
    (out / "report.txt").write_text(report)
    print(report, end="")


if __name__ == "__main__":
    main()
