"""XLA einsum attention (bf16 probs, fused iota mask) at decoder prefill
shapes vs the flash kernel — XLA streams ~2x the Pallas DMA rate, so
materializing bf16 scores may win even at T=656.

PYTHONPATH=/root/repo:/root/.axon_site python exp/xla_attn_dec.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops.flash_mma import flash_mma_attention
from aki_tpu.ops.masks import MMASpec

B, T, H, D = 16, 656, 32, 96
LAYERS = 32
N = 6


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


def scan_bench(name, call, q, k, v, *rest):
    def run(q, k, v, *rest):
        def body(c, _):
            o = call(c, k, v, *rest)
            return (c + 0.001 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, q, None, length=LAYERS)
        return c.reshape(-1)[:8]

    ms = timeit(jax.jit(run), q, k, v, *rest) / LAYERS
    print(f"{name:56s} {ms:8.3f} ms/call", flush=True)


def xla_mma_attention(q, k, v, img_start, txt_start, txt_end, kv_valid):
    """Dense-mask XLA attention, bf16 probabilities, mask via fused iota."""
    scale = D ** -0.5
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T, T), 2)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T, T), 3)
    ok = k_pos <= q_pos
    ok = ok | ((q_pos >= img_start[:, None, :, None])
               & (q_pos < txt_start[:, None, :, None])
               & (k_pos >= txt_start[:, None, :, None])
               & (k_pos < txt_end[:, None, :, None]))
    ok = ok & (kv_valid[:, None, None, :] != 0)
    s = jnp.where(ok, s, -1e30)
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bthd", p, v,
                   preferred_element_type=jnp.float32)
    live = (m > -5e29).transpose(0, 2, 1, 3)
    return jnp.where(live, o / jnp.maximum(l, 1e-9).transpose(0, 2, 1, 3),
                     0.0).astype(q.dtype)


def main():
    rng = np.random.RandomState(0)
    q = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    k = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    v = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    spec = MMASpec(
        img_start=jnp.zeros((B, 1), jnp.int32),
        txt_start=jnp.full((B, 1), 144, jnp.int32),
        txt_end=jnp.full((B, 1), T, jnp.int32),
    )
    kvv = jnp.ones((B, T), jnp.int32)

    scan_bench("flash kernel (prod)",
               lambda q, k, v: flash_mma_attention(
                   q, k, v, spec=spec, kv_valid=kvv), q, k, v)
    scan_bench("xla dense-mask bf16-probs",
               lambda q, k, v: xla_mma_attention(
                   q, k, v, spec.img_start, spec.txt_start, spec.txt_end,
                   kvv), q, k, v)

    o_f = flash_mma_attention(q, k, v, spec=spec, kv_valid=kvv)
    o_x = xla_mma_attention(q, k, v, spec.img_start, spec.txt_start,
                            spec.txt_end, kvv)
    print("xla vs flash maxerr:",
          float(jnp.max(jnp.abs((o_f - o_x).astype(jnp.float32)))),
          flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
