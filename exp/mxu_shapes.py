"""int8 MXU rate vs (M, K, N) — where does the 309-TOPS vision-chain rate
go at decoder shapes?

All variants: int8 x int8 dot -> >>8 -> int8 out (full output consumed by
the next iteration, no DCE), scanned over L weight slices.

PYTHONPATH=/root/repo:/root/.axon_site python exp/mxu_shapes.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, n=5):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def rate(m, k, n, L=8):
    key = jax.random.PRNGKey(0)
    x8 = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    # square-ish chain: w maps k->n, then a second maps n->k to close the
    # loop so the chain reuses shapes without DCE
    w1 = jax.random.randint(key, (L, k, n), -127, 127, jnp.int8)
    w2 = jax.random.randint(key, (L, n, k), -127, 127, jnp.int8)

    @jax.jit
    def run(x8, w1, w2):
        def body(c, ws):
            a, b = ws
            y = jax.lax.dot_general(c, a, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y8 = jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
            z = jax.lax.dot_general(y8, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(z >> 8, -127, 127).astype(jnp.int8), None

        c, _ = jax.lax.scan(body, x8, (w1, w2))
        return c

    ms = timeit(run, x8, w1, w2) / L
    flops = 2 * 2 * m * k * n
    print(f"M={m:6d} K={k:5d} N={n:5d}: {ms:8.2f} ms/pair "
          f"| {flops / (ms / 1e3) / 1e12:6.1f} TOPS", flush=True)


def main():
    rate(11664, 1152, 1152)   # vision-chain shape (309 TOPS reference)
    rate(11264, 3072, 8192)   # decoder mlp at bs16
    rate(33792, 3072, 8192)   # decoder mlp at bs48
    rate(33792, 3072, 3072)   # decoder qkv/o at bs48
    rate(11664, 3072, 3072)
    rate(33792, 1152, 1152)   # vision K/N at decoder M
    rate(8448, 3072, 8192)    # bs48 M split in 4


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
