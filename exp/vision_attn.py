"""Vision attention (729 tok, 16 heads, head_dim 72, non-causal) impls.

The profiler shows flash_mma_attention eats 35.7 of the tower's 71 ms at
bs16 — ~1% MXU efficiency on 39 GFLOP. Candidates:
  flash   : current Pallas kernel (single 768-tile, block_h grouping)
  dense   : ops.attention.dense_attention (fp32 softmax oracle)
  xla     : plain bf16 einsum + f32 softmax, no mask (non-causal)
  flash128: pad head_dim 72->128 with zeros, slice back

PYTHONPATH=/root/repo:/root/.axon_site python exp/vision_attn.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

B, T, H, D = 16, 729, 16, 72


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, n=10):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n


def xla_attn(q, k, v):
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    from aki_tpu.ops.attention import dense_attention
    from aki_tpu.ops.flash_mma import flash_mma_attention

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, T, H, D), jnp.bfloat16)

    flash = jax.jit(lambda q, k, v: flash_mma_attention(q, k, v, causal=False))
    t = timeit(flash, q, k, v)
    print(f"flash       : {t * 1e3:7.2f} ms", flush=True)
    ref = flash(q, k, v)

    xla = jax.jit(xla_attn)
    t2 = timeit(xla, q, k, v)
    err = float(jnp.max(jnp.abs((xla(q, k, v) - ref).astype(jnp.float32))))
    print(f"xla bf16    : {t2 * 1e3:7.2f} ms  maxerr {err:.4f}", flush=True)

    dense = jax.jit(lambda q, k, v: dense_attention(q, k, v, causal=False))
    t3 = timeit(dense, q, k, v)
    print(f"dense fp32  : {t3 * 1e3:7.2f} ms", flush=True)

    def flash128(q, k, v):
        pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - D)))
        o = flash_mma_attention(pad(q), pad(k), pad(v), causal=False,
                                scale=D ** -0.5)
        return o[..., :D]

    f128 = jax.jit(flash128)
    t4 = timeit(f128, q, k, v)
    err = float(jnp.max(jnp.abs((f128(q, k, v) - ref).astype(jnp.float32))))
    print(f"flash pad128: {t4 * 1e3:7.2f} ms  maxerr {err:.4f}", flush=True)

    # batched-heads variant: fold heads into batch for the xla path
    def xla_bh(q, k, v):
        qh = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
        kh = k.transpose(0, 2, 1, 3).reshape(B * H, T, D)
        vh = v.transpose(0, 2, 1, 3).reshape(B * H, T, D)
        s = jnp.einsum("btd,bsd->bts", qh, kh,
                       preferred_element_type=jnp.float32) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bts,bsd->btd", p, vh,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        return o.reshape(B, H, T, D).transpose(0, 2, 1, 3)

    xb = jax.jit(xla_bh)
    t5 = timeit(xb, q, k, v)
    print(f"xla folded  : {t5 * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
