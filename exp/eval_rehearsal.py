"""Real-weights-day eval rehearsal (VERDICT r4 #5b): run the CV-Bench and
MME eval harnesses ON CHIP at the real AKI-4B geometry with random weights
and synthetic samples — record warmup compile count/time and eval
throughput, and shake out anything that would break with real weights.

The tokenizer is HashTokenizer(32064) (same interface + special-token
layout as the real Phi-3.5 tokenizer, so config_for_tokenizer reproduces
the released head geometry exactly); images go through the REAL decode +
preprocess path (PNG bytes -> PIL -> resize/normalize), prompts through
the byte-exact render + encode path.

PYTHONPATH=/root/repo:/root/.axon_site python exp/eval_rehearsal.py
Knobs: NCV=64 NYORN=32 BATCH=16 NEWTOK=16
"""
import base64
import io
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

NCV = int(os.environ.get("NCV", "64"))
NYORN = int(os.environ.get("NYORN", "32"))
BATCH = int(os.environ.get("BATCH", "16"))
NEWTOK = int(os.environ.get("NEWTOK", "16"))

WORDS = ("the quick brown fox jumps over a lazy dog near some tall green "
         "trees while birds fly past old stone walls and small boats").split()


def synth_png(rng, size=96):
    from PIL import Image

    arr = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def main():
    from aki_tpu.data.tokenizer import HashTokenizer
    from aki_tpu.infer.eval_cv_bench import render_prompt, run_eval
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import Policy
    from aki_tpu.models.configs import aki_4b, aki_tiny, config_for_tokenizer

    on_tpu = jax.default_backend() == "tpu"
    tok = HashTokenizer(32064)
    base = aki_4b() if on_tpu else aki_tiny(tok.info.vocab_size)
    cfg = config_for_tokenizer(base, tok.info)
    policy = Policy(param_dtype=jnp.bfloat16)

    t0 = time.perf_counter()
    params = jax.jit(lambda k: init_aki(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    # ---- CV-Bench path: raw images + rendered prompts through run_eval
    rng = np.random.RandomState(3)
    samples = []
    for i in range(NCV):
        q = " ".join(rng.choice(WORDS, rng.randint(6, 60)))
        choices = [" ".join(rng.choice(WORDS, 3)) for _ in range(4)]
        ids = tok.encode(render_prompt(q, choices))
        from PIL import Image

        raw = Image.open(io.BytesIO(synth_png(rng))).convert("RGB")
        samples.append({
            "ids": ids, "image": raw,   # PIL: run_eval preprocesses per batch
            "image_size": cfg.siglip.image_size,
            "answer": "ABCD"[i % 4], "source": ("2D" if i % 2 else "3D"),
        })
    lens = sorted(len(s["ids"]) for s in samples)
    print(f"cv-bench: {NCV} samples, prompt lens {lens[0]}..{lens[-1]}",
          flush=True)

    t0 = time.perf_counter()
    preds = run_eval(params, cfg, tok, samples, batch_size=BATCH,
                     max_new_tokens=NEWTOK, policy=policy, warmup=True)
    dt = time.perf_counter() - t0
    n_ok = sum(p is not None for p in preds)
    print(f"cv-bench eval (incl. warmup): {dt:.1f}s "
          f"({NCV / dt:.2f} img/s end-to-end), {n_ok}/{NCV} predictions",
          flush=True)
    # second pass = warm throughput (compiles cached)
    t0 = time.perf_counter()
    run_eval(params, cfg, tok, samples, batch_size=BATCH,
             max_new_tokens=NEWTOK, policy=policy, warmup=False)
    dt = time.perf_counter() - t0
    print(f"cv-bench eval (warm): {dt:.1f}s ({NCV / dt:.2f} img/s)",
          flush=True)

    # ---- MME path: the real CLI loader + scorer on a synthetic JSONL
    from aki_tpu.infer import eval_yorn

    rows = []
    for i in range(NYORN):
        q = (" ".join(rng.choice(WORDS, rng.randint(5, 25)))
             + " Please answer yes or no.")
        rows.append({
            "index": i,
            "question": q,
            "answer": "Yes" if i % 2 == 0 else "No",
            "category": "existence",
            "image": base64.b64encode(synth_png(rng)).decode(),
        })
    path = "/tmp/eval_rehearsal_mme.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    records = eval_yorn.load_records(path)
    t0 = time.perf_counter()
    preds = eval_yorn.run(records, params, cfg, tok, batch_size=BATCH,
                          max_new_tokens=NEWTOK, warmup=True)
    dt = time.perf_counter() - t0
    report = eval_yorn.score_mme(records, preds)
    print(f"mme eval (incl. warmup): {dt:.1f}s "
          f"({NYORN / dt:.2f} img/s); report keys "
          f"{sorted(report)[:6]}", flush=True)
    print("REHEARSAL OK", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} ncv={NCV} nyorn={NYORN} "
          f"batch={BATCH} newtok={NEWTOK}", flush=True)
    main()
