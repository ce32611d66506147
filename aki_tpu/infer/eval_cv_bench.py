"""CV-Bench evaluation CLI.

Behavioral port of ``eval_cv_bench/eval.py``, byte-exact on the prompt and
scoring rule:

- text input (eval.py:167): ``"Answer with the option's letter from the
  given choices directly. {question}\\nOptions:\\n{A. choice lines}\\n"``
  (instruction FIRST, ``A.`` letter style — prompt wording shifts MCQ
  accuracy, so this is load-bearing);
- chat template (eval.py:54-64): ``<s> <|system|>\\n{SYSTEM}<|end|>\\n
  <|user|>\\n<image>\\n{query}<|end|>\\n<|assistant|>\\n`` tokenized with
  ``add_special_tokens=False`` (the literal ``<s> `` prefix supplies bos);
- prediction = decoded *new* tokens only (the reference generates from
  inputs_embeds, so HF returns generated ids only), scored by EXACT string
  equality against the answer with parens stripped (eval.py:171-177);
- 2D accuracy = mean(ADE20K acc, COCO acc) — per-source average, not a
  pooled sample mean; combined = (2D + 3D) / 2 (eval.py:120-131).

TPU-side: prompts are right-padded into LENGTH BUCKETS and generated in
fixed-size batches, so the jitted engine compiles O(buckets) times instead
of once per distinct prompt length (~2,600 near-unique lengths on the real
set would each trigger a 4B recompile).

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
import jax
import jax.numpy as jnp

from ..data.images import preprocess
from ..data.sft.templates import SYSTEM_MESSAGE
from ..data.tokenizer import load_tokenizer
from ..models.aki import init_aki
from ..models.common import Policy
from ..models.configs import aki_4b, aki_tiny, config_for_tokenizer
from .engine import generate

BUCKETS = (96, 128, 192, 256, 384, 512, 768, 1024)


def optionize_choices(choices: list[str]) -> str:
    """``A. choice`` lines (eval.py:40-51)."""
    options = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    return "\n".join(f"{options[i]}. {c}" for i, c in enumerate(choices))


def render_prompt(question: str, choices: list[str]) -> str:
    """Full prompt, byte-exact vs eval.py:54-64 + :167."""
    text_input = (
        "Answer with the option's letter from the given choices directly. "
        f"{question}\nOptions:\n{optionize_choices(choices)}\n"
    )
    return (
        f"<s> <|system|>\n{SYSTEM_MESSAGE}<|end|>\n"
        f"<|user|>\n<image>\n{text_input}<|end|>\n<|assistant|>\n"
    )


def extract_letter(text: str) -> str | None:
    """Lenient letter extraction (diagnostics only — scoring is exact)."""
    m = re.search(r"\(?([A-F])\)?", text.strip())
    return m.group(1) if m else None


def pick_bucket(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds the largest bucket")


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


def run_eval(params, cfg, tokenizer, samples, *, batch_size=16,
             max_new_tokens=256, policy=None, n_vis=None,
             attn_mode=None, warmup=True):
    """Bucketed batched greedy generation.

    samples: list of dicts {ids, image (H,W,C) float32, answer, source}.
    Returns per-sample dicts with predictions.

    ``warmup=True`` compiles every length bucket the sample set needs
    BEFORE the eval loop (one dummy batch per bucket, serialized) — the
    same treatment ``ServingEngine.warmup()`` gives the server: through a
    tunneled runtime a mid-eval 4B compile costs tens of seconds, and an
    eval that stalls on its 5th bucket an hour in reads as a hang.
    ``attn_mode`` ("mma" | "dot" | "causal") runs the reference's
    ablation modes (README.md:81-87) through the same bucketed path.
    """
    policy = policy or Policy(param_dtype=jnp.bfloat16)
    n_vis = n_vis or cfg.perceiver.num_latents
    by_bucket: dict[int, list[int]] = {}
    for i, s in enumerate(samples):
        by_bucket.setdefault(pick_bucket(len(s["ids"])), []).append(i)

    if warmup:
        s_img = cfg.siglip.image_size
        for bucket in sorted(by_bucket):
            max_len = -(-(bucket + n_vis + max_new_tokens) // 128) * 128
            ids = np.full((batch_size, bucket), cfg.pad_token_id, np.int32)
            valid = np.zeros((batch_size, bucket), np.int32)
            valid[:, 0] = 1
            tokens, _ = generate(
                params, cfg, jnp.asarray(ids),
                jnp.zeros((batch_size, s_img, s_img, 3), np.float32),
                jnp.asarray(valid), max_new_tokens=max_new_tokens,
                max_len=max_len, eos_id=tokenizer.info.end_id,
                policy=policy, attn_mode=attn_mode,
            )
            np.asarray(tokens)   # serialize: one live compile at a time

    results = [None] * len(samples)
    for bucket, idxs in sorted(by_bucket.items()):
        # max_len: bucket + spliced vision + decode room, 128-aligned
        max_len = -(-(bucket + n_vis + max_new_tokens) // 128) * 128
        for lo in range(0, len(idxs), batch_size):
            chunk = idxs[lo: lo + batch_size]
            rows = chunk + [chunk[0]] * (batch_size - len(chunk))  # pad batch
            ids = np.zeros((batch_size, bucket), np.int32)
            ids[:] = cfg.pad_token_id
            valid = np.zeros((batch_size, bucket), np.int32)
            imgs = np.zeros(
                (batch_size, cfg.siglip.image_size, cfg.siglip.image_size, 3),
                np.float32,
            )
            for r, si in enumerate(rows):
                s = samples[si]
                n = len(s["ids"])
                ids[r, :n] = s["ids"]
                valid[r, :n] = 1
                if r >= len(chunk):      # batch-pad rows repeat chunk[0] —
                    imgs[r] = imgs[0]    # reuse its preprocessed pixels
                    continue
                im = s["image"]
                if "image_size" in s:  # raw PIL/array: preprocess per batch
                    im = preprocess(im, s["image_size"])
                imgs[r] = im
            tokens, num = generate(
                params, cfg, jnp.asarray(ids), jnp.asarray(imgs),
                jnp.asarray(valid), max_new_tokens=max_new_tokens,
                max_len=max_len, eos_id=tokenizer.info.end_id, policy=policy,
                attn_mode=attn_mode,
            )
            tokens = np.asarray(tokens)
            num = np.asarray(num)
            for r, si in enumerate(chunk):
                text = tokenizer.decode(tokens[r][: int(num[r])])
                results[si] = text
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data", required=True,
                    help="local CV-Bench dir (HF datasets format or parquet)")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--out", default="cv_bench_results")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--attn-mode", default=None,
                    choices=("mma", "dot", "causal"),
                    help="attention ablation (README.md:81-87 table); "
                         "default = mma, the released-model mode")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the per-bucket compile pass")
    args = ap.parse_args(argv)

    tokenizer = load_tokenizer(args.tokenizer)
    base = aki_tiny(tokenizer.info.vocab_size) if args.tiny else aki_4b()
    cfg = config_for_tokenizer(base, tokenizer.info)
    params = load_params(args.checkpoint, cfg)

    import datasets as hfds

    ds = hfds.load_dataset(args.data, split="test")
    if args.limit:
        ds = ds.select(range(min(args.limit, len(ds))))

    img_size = cfg.siglip.image_size
    samples = []
    for ex in ds:
        prompt = render_prompt(ex["question"], ex["choices"])
        samples.append({
            # add_special_tokens=False: the "<s> " prefix supplies bos
            "ids": tokenizer.encode(prompt),
            # raw image kept; preprocessing happens inside the batch loop
            # (materializing ~2.6k (384,384,3) float32 up front costs
            # ~4.6 GB host RAM for nothing)
            "image": ex["image"],
            "image_size": img_size,
            "answer": ex["answer"].replace("(", "").replace(")", ""),
            "source": ex.get("source", "unknown"),
        })

    preds = run_eval(params, cfg, tokenizer, samples,
                     batch_size=args.batch,
                     max_new_tokens=args.max_new_tokens,
                     attn_mode=args.attn_mode, warmup=not args.no_warmup)

    results = []
    correct_by_source: dict[str, list[int]] = {}
    for i, (s, text) in enumerate(zip(samples, preds)):
        ok = int(text == s["answer"])  # reference: exact equality
        correct_by_source.setdefault(s["source"], []).append(ok)
        results.append({
            "idx": i, "source": s["source"], "pred": text[:40],
            "gold": s["answer"], "correct": ok,
        })

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    with (out / "predictions.csv").open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        w.writeheader()
        w.writerows(results)

    # per-source accuracies; 2D = mean(ADE, COCO), combined = (2D + 3D)/2
    # (eval.py:120-131 — per-source average, not pooled)
    def acc(src):
        vals = correct_by_source.get(src, [])
        return 100.0 * np.mean(vals) if vals else None

    def fmt(v):
        return f"{v:.2f}" if v is not None else "n/a"

    def mean_present(*vals):
        # full-set semantics unchanged; partial runs (--limit selects a
        # prefix of the source-ordered set) average the PRESENT sources
        # instead of reporting NaN everywhere
        present = [v for v in vals if v is not None]
        return float(np.mean(present)) if present else None

    a_ade, a_coco, a_omni = acc("ADE20K"), acc("COCO"), acc("Omni3D")
    acc2d = mean_present(a_ade, a_coco)
    acc3d = a_omni
    report = (
        f"CV-Bench Accuracy: {fmt(mean_present(acc2d, acc3d))}\n"
        f"2D Accuracy: {fmt(acc2d)}\n"
        f"3D Accuracy: {fmt(acc3d)}\n"
        f"ADE20K Accuracy: {fmt(a_ade)}\n"
        f"COCO Accuracy: {fmt(a_coco)}\n"
        f"Omni3D Accuracy: {fmt(a_omni)}\n"
    )
    (out / "report.txt").write_text(report)
    print(report, end="")


if __name__ == "__main__":
    main()
