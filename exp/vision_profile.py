"""Where do the vision tower's 95 ms (bs16, int8) go?

Times, on the real chip at AKI serving geometry (SigLIP SO400M, 729 tok):
  1. full siglip_forward (w8a8)
  2. attention ablated (identity)      -> attention cost
  3. act-quant ablated (pre-quantized) -> dynamic-quant cost
  4. bare int8 matmul chain of the same shapes -> achievable ceiling
  5. bf16 full tower for reference

PYTHONPATH=/root/repo:/root/.axon_site python exp/vision_profile.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.models.common import Policy
from aki_tpu.models.configs import aki_4b
from aki_tpu.models.quant import quantize_tensor
from aki_tpu.models.siglip import init_siglip, siglip_forward

B = 16


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, n=8):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n


def main():
    cfg = aki_4b().siglip
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: init_siglip(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )

    def q_tree(p):
        out = {
            "patch_embed": p["patch_embed"],   # production leaves it float
            "pos_embed": p["pos_embed"],
            "post_ln": p["post_ln"],
            "layers": dict(p["layers"]),
        }
        for k in ("wq", "wk", "wv", "wo"):
            out["layers"][k] = quantize_tensor(p["layers"][k], a8=True)
        out["layers"]["fc1"] = {
            "w": quantize_tensor(p["layers"]["fc1"]["w"], a8=True),
            "b": p["layers"]["fc1"]["b"]}
        out["layers"]["fc2"] = {
            "w": quantize_tensor(p["layers"]["fc2"]["w"], a8=True),
            "b": p["layers"]["fc2"]["b"]}
        return out

    qparams = jax.jit(q_tree)(params)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, cfg.image_size, cfg.image_size, 3),
                      jnp.float32)

    fwd = jax.jit(lambda p, im: siglip_forward(p, cfg, im, policy=policy))
    t = timeit(fwd, qparams, img)
    print(f"full tower int8      : {t * 1e3:7.2f} ms", flush=True)

    tb = timeit(fwd, params, img)
    print(f"full tower bf16      : {tb * 1e3:7.2f} ms", flush=True)

    # --- bare int8 matmul chain, same shapes, no quant/ln/attn ---------
    d, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    T = cfg.num_patches
    M = B * T
    key = jax.random.PRNGKey(1)
    xq = jax.random.randint(key, (M, d), -127, 127, jnp.int8)
    wq4 = jax.random.randint(key, (L, 4, d, d), -127, 127, jnp.int8)
    w1 = jax.random.randint(key, (L, d, inter), -127, 127, jnp.int8)
    w2 = jax.random.randint(key, (L, inter, d), -127, 127, jnp.int8)

    @jax.jit
    def chain(xq, wq4, w1, w2):
        def body(x, lp):
            a, b_, c = lp
            acc = jnp.zeros((M, d), jnp.int32)
            for i in range(4):
                acc += jax.lax.dot_general(
                    x, a[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            h = jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(h, b_, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y8 = jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
            z = jax.lax.dot_general(y8, c, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(z >> 8, -127, 127).astype(jnp.int8), None

        out, _ = jax.lax.scan(body, xq, (wq4, w1, w2))
        return out

    t2 = timeit(chain, xq, wq4, w1, w2)
    flops = L * (4 * 2 * M * d * d + 2 * 2 * M * d * inter)
    print(f"bare int8 chain      : {t2 * 1e3:7.2f} ms "
          f"({flops / t2 / 1e12:6.1f} TOPS)", flush=True)

    # --- ablations on the real tower -----------------------------------
    import aki_tpu.models.siglip as sig
    import aki_tpu.ops.flash_mma as fm

    orig_flash = fm.flash_mma_attention
    fm.flash_mma_attention = lambda q, k, v, causal=False: v
    try:
        fwd2 = jax.jit(lambda p, im: siglip_forward(p, cfg, im, policy=policy))
        t3 = timeit(fwd2, qparams, img)
        print(f"tower, attn ablated  : {t3 * 1e3:7.2f} ms "
              f"(attn = {(t - t3) * 1e3:5.2f} ms)", flush=True)
    finally:
        fm.flash_mma_attention = orig_flash

    # gelu in bf16 instead of fp32
    orig_gelu = jax.nn.gelu
    # (can't monkeypatch jax.nn.gelu shape easily inside jit; measure the
    # elementwise tail instead: layernorm+gelu-only chain)
    x = jax.random.normal(key, (B, T, d), jnp.bfloat16)
    g = jax.random.normal(key, (B, T, inter), jnp.bfloat16)

    @jax.jit
    def elem(x, g, sc, bi):
        def body(c, _):
            x, g = c
            mu = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
            var = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
            h = ((x - mu) * jax.lax.rsqrt(var + 1e-6) * sc + bi).astype(x.dtype)
            g2 = jax.nn.gelu(g.astype(jnp.float32),
                             approximate=True).astype(g.dtype)
            return (h, g2), None

        (x, g), _ = jax.lax.scan(body, (x, g), None, length=2 * L)
        return x + g[..., :d]

    sc = jnp.ones((d,), jnp.float32)
    bi = jnp.zeros((d,), jnp.float32)
    t4 = timeit(elem, x, g, sc, bi)
    print(f"ln+gelu chain (2L)   : {t4 * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    main()
