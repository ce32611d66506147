"""Isolate vision-attention cost: wrapper relayout vs kernel vs mask VPU.

Shapes: (B=16, T=729, H=16, D=72) — SigLIP SO400M at bs16.
PYTHONPATH=/root/repo:/root/.axon_site python exp/vision_attn.py
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

from aki_tpu.ops.flash_mma import flash_mma_attention, _kernel_1kv
from aki_tpu.ops.attention import dense_attention

B, T, H, D = 16, 729, 16, 72
N = 20


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
    print(f"{name:52s} {ms:8.3f} ms", flush=True)


def kernel_only(q, k, v, plain):
    """pallas_call directly on (B, H, Tp, Dp) pre-laid-out tensors."""
    b, h, tp, dp = q.shape
    z = jnp.zeros((b, 1), jnp.int32)
    kv_valid = jnp.ones((b, 1, tp), jnp.int32)
    block_h = 16

    if plain:
        def kern(i0, t0, t1, qo, q_ref, k_ref, v_ref, kvv_ref, o_ref):
            for g in range(block_h):
                qq = q_ref[0, g]
                s = jax.lax.dot_general(
                    qq, k_ref[0, g], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                acc = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[0, g],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, g] = (acc / l).astype(o_ref.dtype)
    else:
        kern = functools.partial(
            _kernel_1kv, block_q=tp, block_kv=tp, block_h=block_h,
            num_images=1, causal=False,
        )
    grid = (b, h // block_h, 1, 1)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_h, tp, dp),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0)),
                pl.BlockSpec((1, block_h, tp, dp),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0)),
                pl.BlockSpec((1, block_h, tp, dp),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0)),
                pl.BlockSpec((1, 1, tp),
                             lambda bb, hh, qi, kj, *_: (bb, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_h, tp, dp),
                                   lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(z, z, z, z[:, 0], q, k, v, kv_valid)


def main():
    rng = np.random.RandomState(0)
    q = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    k = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    v = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)

    f0 = jax.jit(lambda q, k, v: flash_mma_attention(q, k, v, causal=False)[:, 0, 0, :8])
    report("flash wrapper (pad 72->128 + transpose)", timeit(f0, q, k, v))

    qp = jnp.array(rng.randn(B, 768, H, 128).astype(np.float32), jnp.bfloat16)
    kp, vp = qp + 1, qp + 2
    f1 = jax.jit(lambda q, k, v: flash_mma_attention(q, k, v, causal=False)[:, 0, 0, :8])
    report("flash wrapper, inputs already 768x128", timeit(f1, qp, kp, vp))

    qt = jnp.array(rng.randn(B, H, 768, 128).astype(np.float32), jnp.bfloat16)
    kt, vt = qt + 1, qt + 2
    f2 = jax.jit(lambda q, k, v: kernel_only(q, k, v, False)[:, 0, 0, :8])
    report("kernel only (bhtd layout, masked kernel)", timeit(f2, qt, kt, vt))

    f3 = jax.jit(lambda q, k, v: kernel_only(q, k, v, True)[:, 0, 0, :8])
    report("kernel only, no-mask softmax", timeit(f3, qt, kt, vt))

    # 72-lane variant: does Mosaic take a (t, 72) block at all?
    qt72 = qt[..., :72]
    try:
        f4 = jax.jit(lambda q, k, v: kernel_only(q, k, v, True)[:, 0, 0, :8])
        report("kernel only, no-mask, D=72 blocks",
               timeit(f4, qt72, kt[..., :72], vt[..., :72]))
    except Exception as e:  # noqa: BLE001
        print(f"D=72 blocks failed: {type(e).__name__}: {str(e)[:150]}")

    f5 = jax.jit(lambda q, k, v: dense_attention(q, k, v, causal=False)[:, 0, 0, :8])
    report("dense XLA attention", timeit(f5, q, k, v))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
