"""Cost of quantize_kv_flat + cache DUS at prefill shapes, in-scan.

PYTHONPATH=/root/repo:/root/.axon_site python exp/kvquant_cost.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops.decode_attention import quantize_kv_flat

B, T, H, D, S = 16, 656, 32, 96, 704
L = 32
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


def main():
    rng = np.random.RandomState(0)
    k = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    ck = jnp.zeros((L, B, S, H * D), jnp.int8)
    cs = jnp.zeros((L, B, S, H), jnp.float32)

    @jax.jit
    def quant_store(k, ck, cs):
        def body(carry, li):
            k, ck, cs = carry
            q8, sc = quantize_kv_flat(k)
            ck = jax.lax.dynamic_update_slice(
                ck, jnp.pad(q8, ((0, 0), (0, S - T), (0, 0)))[None],
                (li, 0, 0, 0))
            cs = jax.lax.dynamic_update_slice(
                cs, jnp.pad(sc, ((0, 0), (0, S - T), (0, 0)))[None],
                (li, 0, 0, 0))
            k = k * 1.0001
            return (k, ck, cs), None

        (k, ck, cs), _ = jax.lax.scan(body, (k, ck, cs), jnp.arange(L))
        return ck[0, 0, 0, :8].astype(jnp.float32) + cs[0, 0, 0, :8]

    ms = timeit(quant_store, k, ck, cs) / L
    print(f"quantize_kv_flat + DUS: {ms:7.3f} ms/layer (x2 for k+v)",
          flush=True)

    @jax.jit
    def quant_only(k):
        def body(c, _):
            q8, sc = quantize_kv_flat(c)
            c = c + 0.0001 * q8.reshape(B, T, H, D).astype(c.dtype)
            return c, None

        c, _ = jax.lax.scan(body, k, None, length=L)
        return c.reshape(-1)[:8]

    ms = timeit(quant_only, k) / L
    print(f"quantize_kv_flat only : {ms:7.3f} ms/layer", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
