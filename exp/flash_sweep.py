"""Per-call flash kernel cost, measured in-tower style: the call runs in a
lax.scan over LAYERS iterations with a perturbed carry, so dispatch
overhead amortizes exactly like the real decoder/vision scan.

PYTHONPATH=/root/repo:/root/.axon_site python exp/flash_sweep.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aki_tpu.ops.flash_mma import flash_mma_attention
from aki_tpu.ops.masks import MMASpec

LAYERS = 27
N = 5


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


def scan_bench(name, make_call, q, k, v):
    def run(q, k, v):
        def body(c, _):
            o = make_call(c, k, v)
            return (c + 0.001 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, q, None, length=LAYERS)
        return c[:, 0, 0, :8]

    ms = timeit(jax.jit(run), q, k, v) / LAYERS
    print(f"{name:56s} {ms:8.3f} ms/call", flush=True)


def main():
    rng = np.random.RandomState(0)

    def qkv(b, t, h, d):
        mk = lambda: jnp.array(
            rng.randn(b, t, h, d).astype(np.float32), jnp.bfloat16)
        return mk(), mk(), mk()

    b = 16
    spec = MMASpec(
        img_start=jnp.zeros((b, 1), jnp.int32),
        txt_start=jnp.full((b, 1), 144, jnp.int32),
        txt_end=jnp.full((b, 1), 656, jnp.int32),
    )
    kvv = jnp.ones((b, 656), jnp.int32)

    # --- vision shapes ----------------------------------------------------
    q, k, v = qkv(b, 729, 16, 72)
    scan_bench("vision 729x16x72 plain (default)",
               lambda q, k, v: flash_mma_attention(q, k, v, causal=False),
               q, k, v)
    ones = jnp.ones((b, 729), jnp.int32)
    scan_bench("vision 729x16x72 masked (kv_valid)",
               lambda q, k, v: flash_mma_attention(
                   q, k, v, causal=False, kv_valid=ones),
               q, k, v)
    for bh in (4, 8, 16):
        scan_bench(f"vision plain block_h={bh}",
                   lambda q, k, v, bh=bh: flash_mma_attention(
                       q, k, v, causal=False, block_h=bh),
                   q, k, v)

    # --- decoder prefill shapes ------------------------------------------
    q, k, v = qkv(b, 656, 32, 96)
    scan_bench("decoder 656x32x96 MMA spec (prod)",
               lambda q, k, v: flash_mma_attention(
                   q, k, v, spec=spec, kv_valid=kvv),
               q, k, v)
    scan_bench("decoder 656x32x96 causal only",
               lambda q, k, v: flash_mma_attention(q, k, v, causal=True),
               q, k, v)
    scan_bench("decoder 656x32x96 causal=False+valid (mask cost probe)",
               lambda q, k, v: flash_mma_attention(
                   q, k, v, causal=False, kv_valid=kvv),
               q, k, v)
    scan_bench("decoder 656x32x96 plain (lower bound)",
               lambda q, k, v: flash_mma_attention(q, k, v, causal=False),
               q, k, v)
    for bh in (2, 4, 16):
        scan_bench(f"decoder MMA block_h={bh}",
                   lambda q, k, v, bh=bh: flash_mma_attention(
                       q, k, v, spec=spec, kv_valid=kvv, block_h=bh),
                   q, k, v)
    for bq in (128, 256, 384):
        scan_bench(f"decoder MMA block_q={bq}",
                   lambda q, k, v, bq=bq: flash_mma_attention(
                       q, k, v, spec=spec, kv_valid=kvv, block_q=bq),
                   q, k, v)

    # reference: jax-shipped TPU flash attention at the same shape
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash)

        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)

        def call(c, k_, v_):
            o = jax_flash(c, k_, v_, causal=True)
            return o

        def run(qt, kt, vt):
            def body(c, _):
                o = call(c, kt, vt)
                return c + 0.001 * o.astype(c.dtype), None
            c, _ = jax.lax.scan(body, qt, None, length=LAYERS)
            return c[:, 0, 0, :8]

        ms = timeit(jax.jit(run), qt, kt, vt) / LAYERS
        print(f"{'jax pallas flash_attention causal (bhtd)':56s} {ms:8.3f} ms/call",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"jax flash unavailable: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
