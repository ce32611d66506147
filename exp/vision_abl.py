"""Vision-tower ablation: where do 95ms (bs16, int8) go vs the 49ms floor?

Variants time siglip_forward with pieces swapped/stubbed. Run on the real
chip: PYTHONPATH=/root/repo:/root/.axon_site python exp/vision_abl.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aki_tpu.models.common import Policy, layernorm
from aki_tpu.models.configs import aki_4b
from aki_tpu.models.quant import mm, quantize_params
from aki_tpu.models.siglip import init_siglip, siglip_forward, patchify
from aki_tpu.ops.attention import dense_attention

BATCH = int(os.environ.get("B", "16"))
N = int(os.environ.get("N", "8"))


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, n=N):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def report(name, ms):
    print(f"{name:44s} {ms:8.2f} ms", flush=True)


def make_variant(attn_mode="flash", gelu_f32=True, act_quant=True,
                 pad_tokens=None):
    """A parameterized copy of siglip_forward's body for ablations."""
    cfg = aki_4b().siglip
    eps, nh, dh = cfg.layer_norm_eps, cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def fwd(pp, images):
        x = patchify(images.astype(jnp.bfloat16), cfg.patch_size)
        x = x @ pp["patch_embed"]["w"] + pp["patch_embed"]["b"]
        x = x + pp["pos_embed"]
        if pad_tokens:
            x = jnp.pad(x, ((0, 0), (0, pad_tokens - x.shape[1]), (0, 0)))

        def body(x, lp):
            b, t, d = x.shape
            h = layernorm(lp["ln1"], x, eps)
            q = (mm(h, lp["wq"]) + lp["bq"]).reshape(b, t, nh, dh)
            k = (mm(h, lp["wk"]) + lp["bk"]).reshape(b, t, nh, dh)
            v = (mm(h, lp["wv"]) + lp["bv"]).reshape(b, t, nh, dh)
            if attn_mode == "flash":
                from aki_tpu.ops.flash_mma import flash_mma_attention
                attn = flash_mma_attention(q, k, v, causal=False)
            elif attn_mode == "dense":
                attn = dense_attention(q, k, v, causal=False)
            elif attn_mode == "skip":
                attn = v
            x = x + (mm(attn.reshape(b, t, d), lp["wo"]) + lp["bo"])
            h2 = layernorm(lp["ln2"], x, eps)
            h2 = mm(h2, lp["fc1"]["w"]) + lp["fc1"]["b"]
            if gelu_f32:
                h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True).astype(x.dtype)
            else:
                h2 = jax.nn.gelu(h2, approximate=True)
            x = x + (mm(h2, lp["fc2"]["w"]) + lp["fc2"]["b"])
            return x, None

        x, _ = jax.lax.scan(body, x, pp["layers"])
        return layernorm(pp["post_ln"], x, eps)

    return fwd


def main():
    cfg = aki_4b()
    vp = jax.jit(lambda k: init_siglip(k, cfg.siglip, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))

    # quantize via the real path (wrap in a fake full tree)
    fake = {"siglip": vp, "phi3": {"layers": {k: jnp.zeros((1, 2, 2), jnp.bfloat16) for k in ("wq","wk","wv","wo","w_gate","w_up","w_down")}},
            "lm_head": {"w": jnp.zeros((2, 2), jnp.bfloat16)}}
    q8 = jax.jit(lambda p: quantize_params(p, mode="w8a8")["siglip"])(fake)
    w8 = jax.jit(lambda p: quantize_params(p, mode="w8")["siglip"])(fake)

    rng = np.random.RandomState(0)
    s = cfg.siglip.image_size
    imgs = jnp.array(rng.randn(BATCH, s, s, 3).astype(np.float32))

    policy = Policy(param_dtype=jnp.bfloat16)
    base = jax.jit(lambda p, im: siglip_forward(p, cfg.siglip, im, policy)[:, 0, :8])
    report("baseline int8-a8 (current default)", timeit(base, q8, imgs))
    report("w8 weight-only (no act quant)", timeit(base, w8, imgs))
    report("bf16", timeit(base, vp, imgs))

    for name, kw, p in [
        ("a8 + attn SKIPPED", dict(attn_mode="skip"), q8),
        ("a8 + dense XLA attention", dict(attn_mode="dense"), q8),
        ("a8 + gelu in bf16", dict(gelu_f32=False), q8),
        ("a8 + tokens padded 729->768", dict(pad_tokens=768), q8),
        ("bf16 + attn SKIPPED", dict(attn_mode="skip"), vp),
    ]:
        fwd = make_variant(**kw)
        f = jax.jit(lambda p_, im, fwd=fwd: fwd(p_, im)[:, 0, :8])
        report(name, timeit(f, p, imgs))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} batch={BATCH}", flush=True)
    main()
