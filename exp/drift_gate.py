"""Full-depth quantized drift budget — the real-weights gate (VERDICT r4 #4).

Round 4's numerics claim ("inside W8A8 noise, greedy parity 1.00") was
tiny-geometry only. This measures, at the REAL AKI-4B geometry on chip,
what the serving configuration does to greedy decode:

- Leg 1 (full 32-layer depth): bf16 params/compute vs the serving config
  (W8A8 dynamic-int8 matmuls + int8 KV). Both legs init from the same
  PRNGKey, run sequentially (the two param trees cannot co-reside: 8.6 GB
  bf16 + 4.3 GB int8 + KV > 16 GB), greedy-decode NPROMPT prompts x NSTEP
  steps, and compare per-step token agreement + prefill last-logit drift
  (normalized by the logit std — random-weight logits are near-flat, so
  raw argmax flips overstate drift; report both).
- Leg 2 (depth DEPTH32=8): fp32 params+compute (highest-precision oracle)
  vs bf16 — the bf16-vs-fp32 half of the drift budget, which leg 1's
  bf16 baseline hides. fp32 at full 32-layer depth does not fit the chip.

The two legs compose: fp32 -> bf16 (leg 2, per-layer drift scales with
depth) and bf16 -> W8A8+kv8 (leg 1, full depth). tests/test_quant_drift.py
pins the thresholds this harness establishes.

Reference decode-semantics contract: src/aki_generation.py:36-85.

PYTHONPATH=/root/repo:/root/.axon_site python exp/drift_gate.py
Knobs: NPROMPT=64 NSTEP=32 BS=16 LEG=both|quant|bf16
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

NPROMPT = int(os.environ.get("NPROMPT", "64"))
NSTEP = int(os.environ.get("NSTEP", "32"))
BS = int(os.environ.get("BS", "16"))
LEG = os.environ.get("LEG", "both")
TINY = os.environ.get("TINY", "0") == "1"
TEXT_LEN = 64 if TINY else 512
MAX_LEN = 160 if TINY else 704
DEPTH_FP32 = int(os.environ.get("DEPTH32", "8"))


def make_prompts(cfg):
    rng = np.random.RandomState(7)
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1,
                      size=(NPROMPT, TEXT_LEN))
    ids[:, 1] = cfg.media_token_id
    ids[:, 40] = cfg.assistant_token_id
    valid = np.ones((NPROMPT, TEXT_LEN), np.int32)
    s = cfg.siglip.image_size
    imgs = rng.randn(NPROMPT, s, s, 3).astype(np.float32)
    return ids, valid, imgs


def run_leg(cfg, ids, valid, imgs, *, quant, kv_int8, param_dtype,
            compute_dtype, label, precision="default"):
    """Init from PRNGKey(0), (optionally) quantize, greedy-decode all
    prompts in BS batches. Returns (tokens (N, NSTEP), last_logits
    (N, V) fp32 from prefill).

    Params ALWAYS init at bf16 and upcast to ``param_dtype``: real
    checkpoints are bf16/fp16, so bf16-representable weights are the
    ground truth in every leg — an fp32-initialized oracle would fold
    param-storage rounding (a fixed property of the checkpoint, shared
    with the reference's own amp_bf16 serving) into the drift number,
    and with random near-flat logits that perturbation alone zeroes
    greedy agreement (measured on the tiny CPU run)."""
    from aki_tpu.infer.engine import generate, prefill
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import Policy
    from aki_tpu.models.quant import quantize_params

    policy = Policy(param_dtype=param_dtype, compute_dtype=compute_dtype)
    t0 = time.perf_counter()
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda a: a.astype(param_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            init_aki(k, cfg, dtype=jnp.bfloat16),
        )
    )(jax.random.PRNGKey(0))
    if quant:
        params = jax.jit(lambda p: quantize_params(p, mode="w8a8"))(params)
    toks_all, logit_all = [], []
    with jax.default_matmul_precision(precision):
        for i in range(0, NPROMPT, BS):
            b_ids = jnp.array(ids[i:i + BS])
            b_val = jnp.array(valid[i:i + BS])
            b_img = jnp.array(imgs[i:i + BS])
            st = prefill(params, cfg, b_ids, b_img, b_val, max_len=MAX_LEN,
                         policy=policy, kv_int8=kv_int8)
            logit_all.append(np.asarray(st.last_logits, np.float32))
            del st
            toks, _ = generate(params, cfg, b_ids, b_img, b_val,
                               max_new_tokens=NSTEP, max_len=MAX_LEN,
                               policy=policy, kv_int8=kv_int8)
            toks_all.append(np.asarray(toks))
    print(f"{label}: {time.perf_counter() - t0:.1f}s", flush=True)
    del params
    gc.collect()
    jax.clear_caches()
    gc.collect()
    return np.concatenate(toks_all), np.concatenate(logit_all)


def compare(name, ref, got):
    t_ref, l_ref = ref
    t_got, l_got = got
    step_agree = (t_ref == t_got).mean(axis=0)   # per-step over prompts
    # trajectory agreement: prefix match until first divergence
    first_div = np.where(
        (t_ref != t_got).any(axis=1),
        (t_ref != t_got).argmax(axis=1), NSTEP)
    drift = np.abs(l_ref - l_got)
    lstd = l_ref.std()
    print(f"\n== {name} ==")
    print(f"token agreement: step0 {step_agree[0]:.3f} "
          f"mean {step_agree.mean():.3f} "
          f"last {step_agree[-1]:.3f}")
    print(f"greedy prefix len (first divergence): "
          f"mean {first_div.mean():.1f} / {NSTEP} "
          f"median {np.median(first_div):.0f} "
          f"full-match {(first_div == NSTEP).mean():.2f}")
    print(f"prefill last-logit drift: max {drift.max():.4f} "
          f"mean {drift.mean():.5f} "
          f"(logit std {lstd:.3f}; relative max {drift.max() / lstd:.3f} "
          f"mean {drift.mean() / lstd:.5f})", flush=True)


def main():
    import dataclasses

    from aki_tpu.models.configs import aki_4b, aki_tiny

    cfg = aki_tiny() if os.environ.get("TINY", "0") == "1" else aki_4b()
    ids, valid, imgs = make_prompts(cfg)

    if LEG in ("both", "quant"):
        ref = run_leg(cfg, ids, valid, imgs, quant=False, kv_int8=False,
                      param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                      label="bf16 full-depth oracle")
        got = run_leg(cfg, ids, valid, imgs, quant=True, kv_int8=True,
                      param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                      label="W8A8 + int8-KV serving config")
        compare("bf16 vs W8A8+kv8 (full 32-layer)", ref, got)

    if LEG in ("both", "bf16"):
        cfg8 = dataclasses.replace(
            cfg, phi3=dataclasses.replace(cfg.phi3, num_layers=DEPTH_FP32))
        ref = run_leg(cfg8, ids, valid, imgs, quant=False, kv_int8=False,
                      param_dtype=jnp.float32, compute_dtype=jnp.float32,
                      precision="highest",
                      label=f"fp32-compute depth-{DEPTH_FP32} oracle "
                            "(shared bf16-representable params)")
        got = run_leg(cfg8, ids, valid, imgs, quant=False, kv_int8=False,
                      param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                      label=f"bf16-compute depth-{DEPTH_FP32}")
        compare(f"fp32 vs bf16 compute (depth {DEPTH_FP32}, shared params)",
                ref, got)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} nprompt={NPROMPT} "
          f"nstep={NSTEP} bs={BS} leg={LEG}", flush=True)
    main()
