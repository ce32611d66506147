"""int8 flash forward vs bf16 kernel: correctness + in-scan cost.

PYTHONPATH=/root/repo:/root/.axon_site python exp/flash_q8.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops.flash_mma import flash_mma_attention, flash_mma_attention_q8
from aki_tpu.ops.masks import MMASpec

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


def scan_bench(name, call, q, k, v):
    def run(q, k, v):
        def body(c, _):
            o = call(c, k, v)
            return (c + 0.001 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, q, None, length=LAYERS)
        return c.reshape(-1)[:8]

    ms = timeit(jax.jit(run), q, k, v) / LAYERS
    print(f"{name:52s} {ms:8.3f} ms/call", flush=True)


def check(tag, b, t, h, d, causal, with_spec):
    rng = np.random.RandomState(0)
    q = jnp.array(rng.randn(b, t, h, d).astype(np.float32), jnp.bfloat16)
    k = jnp.array(rng.randn(b, t, h, d).astype(np.float32), jnp.bfloat16)
    v = jnp.array(rng.randn(b, t, h, d).astype(np.float32), jnp.bfloat16)
    spec = MMASpec(
        img_start=jnp.zeros((b, 1), jnp.int32),
        txt_start=jnp.full((b, 1), min(144, t // 2), jnp.int32),
        txt_end=jnp.full((b, 1), t, jnp.int32),
    ) if with_spec else None
    kvv = jnp.ones((b, t), jnp.int32)

    o_bf = flash_mma_attention(q, k, v, spec=spec, kv_valid=kvv,
                               causal=causal)
    o_q8 = flash_mma_attention_q8(q, k, v, spec=spec, kv_valid=kvv,
                                  causal=causal)
    d_ = np.abs(np.asarray((o_bf - o_q8).astype(jnp.float32)))
    scale = float(np.abs(np.asarray(o_bf.astype(jnp.float32))).max())
    print(f"{tag}: maxabs {d_.max():.4f} (out scale {scale:.2f}) "
          f"mean {d_.mean():.5f}", flush=True)
    return q, k, v, spec, kvv


def main():
    q, k, v, spec, kvv = check("decoder 16x656x32x96 MMA", 16, 656, 32, 96,
                               True, True)
    scan_bench("bf16 kernel (prod)",
               lambda q, k, v: flash_mma_attention(
                   q, k, v, spec=spec, kv_valid=kvv), q, k, v)
    scan_bench("int8 kernel",
               lambda q, k, v: flash_mma_attention_q8(
                   q, k, v, spec=spec, kv_valid=kvv), q, k, v)

    q, k, v, _, ones = check("vision 16x729x16x72 plain", 16, 729, 16, 72,
                             False, False)
    scan_bench("vision bf16 kernel (prod)",
               lambda q, k, v: flash_mma_attention(q, k, v, causal=False),
               q, k, v)
    scan_bench("vision int8 kernel",
               lambda q, k, v: flash_mma_attention_q8(
                   q, k, v, causal=False, kv_valid=ones), q, k, v)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
