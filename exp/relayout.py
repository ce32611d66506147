"""Isolate the pallas-call boundary relayout costs at decoder shapes.

PYTHONPATH=/root/repo:/root/.axon_site python exp/relayout.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, D = 16, 656, 32, 96
LAYERS = 16
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


def scan_bench(name, op, x0):
    def run(x):
        def body(c, _):
            y = op(c)
            # full dependence on y (a single-element tap would let XLA
            # DCE the whole relayout); one bf16 sum pass is ~0.1 ms and
            # identical across variants
            return c + (1e-6 * jnp.sum(y, dtype=jnp.float32)).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=LAYERS)
        return jnp.ravel(c)[:8]

    ms = timeit(jax.jit(run), x0) / LAYERS
    print(f"{name:56s} {ms:8.3f} ms/iter", flush=True)


def pad_to(x, size, axis):
    padw = [(0, 0)] * x.ndim
    padw[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, padw)


def id_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def identity_pallas(x):
    b, h, t, d = x.shape
    return pl.pallas_call(
        id_kernel,
        grid=(b, h // 8),
        in_specs=[pl.BlockSpec((1, 8, t, d), lambda bb, hh: (bb, hh, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, t, d), lambda bb, hh: (bb, hh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def main():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    x128 = jnp.array(rng.randn(B, T, H, 128).astype(np.float32), jnp.bfloat16)
    x768_128 = jnp.array(
        rng.randn(B, H, 768, 128).astype(np.float32), jnp.bfloat16)
    xm = jnp.array(rng.randn(B * T, 3072).astype(np.float32), jnp.bfloat16)
    w = jnp.array(rng.randn(3072, 3072).astype(np.float32), jnp.bfloat16)
    w3d = w.reshape(3072, 32, 96)
    w3d_pad = pad_to(w3d, 128, 2)

    scan_bench("wrapper: pad d 96->128 + pad t + transpose",
               lambda c: pad_to(pad_to(c, 768, 1), 128, 3)
               .transpose(0, 2, 1, 3), x)
    scan_bench("transpose only, d already 128 (t=656)",
               lambda c: c.transpose(0, 2, 1, 3), x128)
    scan_bench("pad t 656->768 + transpose, d=128",
               lambda c: pad_to(c, 768, 1).transpose(0, 2, 1, 3), x128)
    scan_bench("pad d only 96->128 (no transpose)",
               lambda c: pad_to(c, 128, 3), x)
    scan_bench("identity pallas (bhtd 768x128) boundary",
               identity_pallas, x768_128)
    scan_bench("matmul (10496x3072x3072) reference",
               lambda c: (c @ w).reshape(B, T, H, D), xm.reshape(B, T, 3072))
    scan_bench("matmul + reshape + padT+padD+transpose",
               lambda c: pad_to(pad_to(
                   (c.reshape(B * T, 3072) @ w).reshape(B, T, H, D),
                   768, 1), 128, 3).transpose(0, 2, 1, 3),
               xm.reshape(B, T, 3072))
    scan_bench("einsum btm,mhd->bhtd (padded weights, d=128)",
               lambda c: jnp.einsum("btm,mhd->bhtd", c, w3d_pad),
               xm.reshape(B, T, 3072))
    scan_bench("einsum btm,mhd->bhtd then pad t",
               lambda c: pad_to(
                   jnp.einsum("btm,mhd->bhtd", c, w3d_pad), 768, 2),
               xm.reshape(B, T, 3072))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
