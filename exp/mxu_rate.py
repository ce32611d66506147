"""Why do prod int8 matmuls run at ~204 TOPS when a bare int8 chain hits
~309? Isolate the epilogue/operand differences at prod shapes.

Variants at (M=33792, K=3072, N=8192), in-scan over 8 weight slices:
  1. int8 dot -> int32 out (no epilogue)
  2. int8 dot -> f32 row x col scales -> bf16 out (prod epilogue)
  3. int8 dot -> >>8 requant -> int8 out (the 309-TOPS chain's epilogue)
  4. bf16 x bf16 dot -> bf16 (no quant at all)
  5. prod epilogue + act quantize from bf16 input (full mm() cost)

PYTHONPATH=/root/repo:/root/.axon_site python exp/mxu_rate.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

M, K, N = 33792, 3072, 8192
L = 8
FLOPS = 2 * M * K * N


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


def bench(name, fn, *args):
    ms = timeit(fn, *args) / L
    print(f"{name:46s} {ms:8.2f} ms | {FLOPS / (ms / 1e3) / 1e12:6.1f} TOPS",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (L, K, N), -127, 127, jnp.int8)
    sx = jnp.ones((M, 1), jnp.float32)
    sw = jnp.ones((1, N), jnp.float32)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    wb = jax.random.normal(key, (L, K, N), jnp.bfloat16) * 0.01

    def dot8(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def v1(x8, w8):
        acc = jnp.zeros((M, 8), jnp.int32)
        for i in range(L):
            acc += dot8(x8, w8[i])[:, :8]
        return acc

    bench("1. int8 -> int32 (slice-reduced)", v1, x8, w8)

    @jax.jit
    def v2(x8, w8, sx, sw):
        out = None
        for i in range(L):
            y = (dot8(x8, w8[i]).astype(jnp.float32) * sx * sw
                 ).astype(jnp.bfloat16)
            out = y[:, :8] if out is None else out + y[:, :8]
        return out

    bench("2. int8 -> f32 scales -> bf16 (prod)", v2, x8, w8, sx, sw)

    @jax.jit
    def v3(x8, w8):
        outs = []
        for i in range(L):
            y = dot8(x8, w8[i])
            outs.append(jnp.clip(y >> 8, -127, 127).astype(jnp.int8)[:, :8])
        return jnp.concatenate(outs, -1)

    bench("3. int8 -> >>8 -> int8 (bare-chain)", v3, x8, w8)

    @jax.jit
    def v4(xb, wb):
        out = None
        for i in range(L):
            y = jax.lax.dot_general(xb, wb[i], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = y.astype(jnp.bfloat16)[:, :8]
            out = y if out is None else out + y
        return out

    bench("4. bf16 x bf16 -> bf16", v4, xb, wb)

    from aki_tpu.models.quant import quantize_acts

    @jax.jit
    def v5(xb, w8, sw):
        out = None
        for i in range(L):
            q, s = quantize_acts(xb)
            y = (dot8(q, w8[i]).astype(jnp.float32) * s * sw
                 ).astype(jnp.bfloat16)[:, :8]
            out = y if out is None else out + y
        return out

    bench("5. act-quant + prod epilogue", v5, xb, w8, sw)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} M={M} K={K} N={N}", flush=True)
    main()
