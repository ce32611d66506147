"""Measured TRAINING step on the real chip — ms/step + achieved model
FLOP/s vs the 160 TF/s measured bf16 matmul ceiling (VERDICT r4 missing #2:
the framework's perf story was inference-only).

One jitted SFT train step: fwd + bwd + global-norm clip + AdamW, remat on,
frozen SigLIP (stop_gradient + optax.set_to_zero — no moments), bf16
compute with fp32 master params (amp_bf16 analogue), donated TrainState.
Geometry is the real AKI-4B widths (hidden 3072, 32 heads, d=96, inter
8192, vocab 32064, full SigLIP-so400m + 6-deep/144-latent perceiver) with
the DECODER depth truncated — full 32-layer fp32 master params + Adam
moments are ~41 GB and cannot fit one 16 GB v5e chip; depth is the honest
knob (per-layer cost is uniform, so ms/step extrapolates linearly).

Timing per CLAUDE.md rules: the tunneled runtime's block_until_ready does
not block -> chain >= 10 donated steps (state threads through) and force
with one scalar fetch.

Model-FLOP accounting (printed): decoder matmuls 6*P_layer*tokens*depth
(fwd 2 + bwd 4), attention 12*B*T^2*h*depth (fwd 4, bwd 8; full-mask
convention, no causal discount), LM head 6*B*T*h*V, perceiver 6*P_perc,
vision 2*P_vis*729*B (fwd only — frozen). MFU = FLOPs / (ms * 160 TF/s).

PYTHONPATH=/root/repo:/root/.axon_site python exp/train_bench.py
Knobs: DEPTH=4 BS=8 TEXT=512 STEPS=10 REMAT=1 OFFLOAD=0 FROZEN_BF16=1
plus AKI_REMAT_POLICY=dots|dots_nowide (models/phi3.py:_remat_policy).
Round-5 geometry sweep + the three memory levers that moved bs8 -> bs16
(104.2 -> 116.7 TF/s): PERF.md "measured TRAINING step" section.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

DEPTH = int(os.environ.get("DEPTH", "4"))
BS = int(os.environ.get("BS", "8"))
TEXT = int(os.environ.get("TEXT", "512"))
STEPS = int(os.environ.get("STEPS", "10"))
REMAT = os.environ.get("REMAT", "1") == "1"
OFFLOAD = os.environ.get("OFFLOAD", "0") == "1"
# frozen SigLIP stored bf16 (no master copy for frozen subtrees — compute
# is bit-identical, see optim.cast_frozen_to). Default on.
FROZEN_BF16 = os.environ.get("FROZEN_BF16", "1") == "1"
# gradient accumulation microbatches (one jitted step consumes ACCUM
# microbatches of BS each — the production large-effective-batch shape).
# ACCUM_UNROLL=1 unrolls the accumulation loop instead of lax.scan: the
# scan double-buffers the carried f32 grad tree (+2.9 GB at AKI-4B) and
# OOMs at depth-4 bs8 where the unrolled form fits (see step.py).
ACCUM = int(os.environ.get("ACCUM", "1"))
ACCUM_UNROLL = os.environ.get("ACCUM_UNROLL", "1") == "1"
VISION_DEPTH = int(os.environ.get("VISION_DEPTH", "0"))  # 0 = real 27


def flops_per_step(cfg, bs, t_spliced):
    p3 = cfg.phi3
    h, inter = p3.hidden_size, p3.intermediate_size
    kv = p3.num_kv_heads * p3.head_dim
    p_layer = h * (h + 2 * kv) + h * h + 2 * h * inter
    toks = bs * t_spliced
    dec = 6 * p_layer * toks * p3.num_layers
    attn = 12 * bs * t_spliced ** 2 * h * p3.num_layers
    head = 6 * toks * h * cfg.output_vocab
    sig = cfg.siglip
    n_patch = (sig.image_size // sig.patch_size) ** 2
    p_vis_layer = 4 * sig.hidden_size ** 2 + 2 * sig.hidden_size * sig.intermediate_size
    vis = 2 * (p_vis_layer * sig.num_layers) * n_patch * bs \
        + 4 * bs * n_patch ** 2 * sig.hidden_size * sig.num_layers
    pc = cfg.perceiver
    # perceiver: latents x (media+latents) cross-attn + ff, trainable
    p_perc = pc.depth * (pc.dim_inner * pc.dim * 4
                         + 2 * pc.dim * pc.dim * pc.ff_mult * 2)
    perc = 6 * p_perc * bs * (n_patch + pc.num_latents)
    return dec + attn + head + vis + perc, dict(
        dec=dec, attn=attn, head=head, vis=vis, perc=perc)


def main():
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import Policy
    from aki_tpu.models.configs import aki_4b
    from aki_tpu.train.optim import make_optimizer
    from aki_tpu.train.step import Batch, TrainState, make_train_step

    if os.environ.get("TINY", "0") == "1":
        from aki_tpu.models.configs import aki_tiny

        cfg = aki_tiny()
    else:
        cfg = aki_4b()
    cfg = dataclasses.replace(
        cfg, phi3=dataclasses.replace(cfg.phi3, num_layers=DEPTH))
    if VISION_DEPTH:
        cfg = dataclasses.replace(
            cfg, siglip=dataclasses.replace(
                cfg.siglip, num_layers=VISION_DEPTH))
    t_spliced = TEXT + cfg.perceiver.num_latents - 1
    policy = Policy()  # fp32 params, bf16 compute (amp_bf16)

    params = jax.jit(lambda k: init_aki(k, cfg, dtype=jnp.float32))(
        jax.random.PRNGKey(0))
    if FROZEN_BF16:
        from aki_tpu.train.optim import cast_frozen_to

        params = jax.jit(cast_frozen_to)(params)
    n_param = sum(x.size for x in jax.tree.leaves(params))
    n_frozen = sum(x.size for x in jax.tree.leaves(params["siglip"]))
    print(f"depth {DEPTH} bs {BS}: params {n_param / 1e9:.2f}B "
          f"({n_frozen / 1e6:.0f}M frozen vision); fp32+Adam "
          f"{(n_param - n_frozen) * 12 / 1e9:.1f} GB + vision "
          f"{n_frozen * 4 / 1e9:.1f} GB", flush=True)

    opt = make_optimizer(params, learning_rate=2e-5, weight_decay=1e-4,
                         grad_clip=1.0)
    state = TrainState.create(params, opt)
    del params
    step_fn = jax.jit(
        make_train_step(cfg, opt, policy=policy, remat=REMAT,
                        host_offload=OFFLOAD, grad_accum=ACCUM,
                        accum_unroll=ACCUM_UNROLL and ACCUM > 1),
        donate_argnums=(0,),
    )

    rng = np.random.RandomState(0)
    nb = BS * ACCUM
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(nb, TEXT))
    ids[:, 1] = cfg.media_token_id
    ids[:, 40] = cfg.assistant_token_id
    labels = ids.copy()
    labels[:, :41] = -100   # prompt-masked SFT labels
    s = cfg.siglip.image_size
    imgs = rng.randn(nb, s, s, 3).astype(np.float32)
    valid = np.ones((nb, TEXT), np.int32)
    if ACCUM > 1:   # stack microbatches on the leading scan axis
        ids = ids.reshape(ACCUM, BS, TEXT)
        labels = labels.reshape(ACCUM, BS, TEXT)
        valid = valid.reshape(ACCUM, BS, TEXT)
        imgs = imgs.reshape(ACCUM, BS, s, s, 3)
    batch = Batch(
        input_ids=jnp.array(ids, jnp.int32),
        images=jnp.array(imgs),
        attn_valid=jnp.array(valid),
        labels=jnp.array(labels, jnp.int32),
    )

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    loss0 = float(metrics["loss"])
    print(f"compile+step0 {time.perf_counter() - t0:.1f}s "
          f"loss {loss0:.3f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step_fn(state, batch)
    lossN = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    fl, parts = flops_per_step(cfg, BS, t_spliced)
    fl *= ACCUM
    parts = {k: v * ACCUM for k, v in parts.items()}
    tfs = fl / dt / 1e12
    print(f"train step: {dt * 1e3:7.1f} ms | {fl / 1e12:.2f} TF/step "
          f"(dec {parts['dec'] / 1e12:.2f} attn {parts['attn'] / 1e12:.2f} "
          f"head {parts['head'] / 1e12:.2f} vis {parts['vis'] / 1e12:.2f} "
          f"perc {parts['perc'] / 1e12:.2f}) | {tfs:.1f} TF/s "
          f"= {100 * tfs / 160:.1f}% of the 160 TF/s bf16 ceiling | "
          f"loss {loss0:.3f} -> {lossN:.3f}", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} depth={DEPTH} bs={BS} "
          f"remat={REMAT} offload={OFFLOAD}", flush=True)
    main()
