"""Decoder prefill ablation: 550 ms at bs16 vs 390 matmul floor + 103
flash + ~60 elementwise. Which elementwise ops cost what?

PYTHONPATH=/root/repo:/root/.axon_site python exp/prefill_abl.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aki_tpu.models.common import Policy, rmsnorm
from aki_tpu.models.configs import aki_4b
from aki_tpu.models.phi3 import init_phi3, KVCache
from aki_tpu.models.quant import mm, quantize_tensor, QUANT_KEYS
from aki_tpu.ops.masks import MMASpec
from aki_tpu.ops.rope import apply_rope, rope_cos_sin

B = int(os.environ.get("B", "16"))
T = 656          # 512 text + 144 vision
N = int(os.environ.get("N", "8"))
CFG = aki_4b().phi3


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
    print(f"{name:46s} {ms:8.2f} ms", flush=True)


def make_fwd(attn="flash", rope=True, norm=True, cache=False, act="silu_f32"):
    cfg = CFG
    nh, nkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    def fwd(layers, x, cos, sin, spec_args, kv_valid, ck, cv):
        img_start, txt_start, txt_end = spec_args
        spec = MMASpec(img_start=img_start, txt_start=txt_start,
                       txt_end=txt_end)

        def body(carry, scanned):
            x, ck, cv = carry
            lp, li = scanned
            b, t, d = x.shape
            h = rmsnorm(lp["ln1"], x, eps) if norm else x
            q = mm(h, lp["wq"]).reshape(b, t, nh, dh)
            k = mm(h, lp["wk"]).reshape(b, t, nkv, dh)
            v = mm(h, lp["wv"]).reshape(b, t, nkv, dh)
            if rope:
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            if cache:
                ck = jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype)[None], (li, 0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype)[None], (li, 0, 0, 0, 0))
            if attn == "flash":
                from aki_tpu.ops.flash_mma import flash_mma_attention
                a = flash_mma_attention(q, k, v, spec=spec,
                                        kv_valid=kv_valid)
            elif attn == "flash_bq256":
                from aki_tpu.ops.flash_mma import flash_mma_attention
                a = flash_mma_attention(q, k, v, spec=spec,
                                        kv_valid=kv_valid, block_q=256)
            elif attn == "flash_bh16":
                from aki_tpu.ops.flash_mma import flash_mma_attention
                a = flash_mma_attention(q, k, v, spec=spec,
                                        kv_valid=kv_valid, block_h=16)
            elif attn == "dense":
                from aki_tpu.ops.attention import dense_attention
                a = dense_attention(q, k, v, spec=spec, kv_valid=kv_valid)
            elif attn == "plainflash":
                from aki_tpu.ops.flash_mma import flash_mma_attention
                a = flash_mma_attention(q, k, v, causal=False)
            elif attn == "skip_qkept":
                # keep q alive so XLA cannot DCE the wq matmul + rope
                a = v + 1e-6 * q
            elif attn == "idpallas":
                # identical operand/result layouts to the flash wrapper,
                # but the kernel is a copy: isolates integration cost
                from jax.experimental import pallas as pl

                def pad_to(x, size, axis):
                    w = [(0, 0)] * x.ndim
                    w[axis] = (0, size - x.shape[axis])
                    return jnp.pad(x, w)

                qt = pad_to(pad_to(q, 768, 1), 128, 3).transpose(0, 2, 1, 3)
                kt = pad_to(pad_to(k, 768, 1), 128, 3).transpose(0, 2, 1, 3)
                vt = pad_to(pad_to(v, 768, 1), 128, 3).transpose(0, 2, 1, 3)

                def idk(q_ref, k_ref, v_ref, o_ref):
                    o_ref[...] = (q_ref[...] + 1e-6 * k_ref[...]
                                  + 1e-6 * v_ref[...])

                bb, hh = qt.shape[0], qt.shape[1]
                from jax.experimental.pallas import tpu as pltpu
                o = pl.pallas_call(
                    idk,
                    grid=(bb, hh // 8),
                    in_specs=[pl.BlockSpec((1, 8, 768, 128),
                                           lambda i, j: (i, j, 0, 0))] * 3,
                    out_specs=pl.BlockSpec((1, 8, 768, 128),
                                           lambda i, j: (i, j, 0, 0)),
                    out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(qt, kt, vt)
                a = o.transpose(0, 2, 1, 3)[:, :t, :, :dh]
            else:
                a = v
            x = x + mm(a.reshape(b, t, nh * dh), lp["wo"])
            h2 = rmsnorm(lp["ln2"], x, eps) if norm else x
            gate = mm(h2, lp["w_gate"])
            up = mm(h2, lp["w_up"])
            if act == "silu_f32":
                act_v = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            else:
                act_v = jax.nn.silu(gate) * up
            x = x + mm(act_v, lp["w_down"])
            return (x, ck, cv), None

        (x, ck, cv), _ = jax.lax.scan(
            body, (x, ck, cv), (layers, jnp.arange(cfg.num_layers)))
        return x[:, 0, :8]

    return fwd


def main():
    params = jax.jit(lambda k: init_phi3(k, CFG, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    layers = dict(params["layers"])
    for k in QUANT_KEYS:
        layers[k] = jax.jit(lambda w: quantize_tensor(w, a8=True))(layers[k])

    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(B, T, CFG.hidden_size).astype(np.float32),
                  jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    cos, sin = rope_cos_sin(CFG.rope, positions)
    img_start = jnp.zeros((B, 1), jnp.int32)
    txt_start = jnp.full((B, 1), 144, jnp.int32)
    txt_end = jnp.full((B, 1), T, jnp.int32)
    kv_valid = jnp.ones((B, T), jnp.int32)
    cache = KVCache.create(CFG, B, 704)

    only = os.environ.get("ONLY", "")
    for name, kw in [
        ("baseline (flash+rope+norm+cache, a8)", dict(cache=True)),
        ("no cache write", dict()),
        ("attn skipped", dict(attn="skip")),
        ("attn+rope skipped", dict(attn="skip", rope=False)),
        ("attn+rope+norm skipped", dict(attn="skip", rope=False, norm=False)),
        ("attn skipped, q kept (true no-attn base)", dict(attn="skip_qkept")),
        ("attn identity-pallas same layouts", dict(attn="idpallas")),
    ]:
        if only and only not in name:
            continue
        fwd = make_fwd(**kw)
        f = jax.jit(fwd)
        try:
            report(name, timeit(f, layers, x, cos, sin,
                                (img_start, txt_start, txt_end), kv_valid,
                                cache.k, cache.v))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: {type(e).__name__} {str(e)[:80]}", flush=True)
        f = None
        jax.clear_caches()


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B} T={T}", flush=True)
    main()
