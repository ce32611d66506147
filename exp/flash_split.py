"""Where do flash's 2.56 ms/call go: XLA pad/transpose around the kernel,
or the pallas kernel itself?

In-scan at decoder prefill shapes. The bare-kernel variant feeds
pre-transposed (B,H,T,128) operands straight to pallas_call by calling the
wrapper on inputs already shaped so its relayouts are no-ops is impossible
(wrapper always pads/transposes) — instead we time:
  a. full wrapper (B,T,32,96)
  b. the wrapper's relayouts ONLY (pad+transpose to (B,H,T,128) x3 +
     transpose-back of a same-shaped output)
  c. a copy of the pallas_call on pre-relayout operands

PYTHONPATH=/root/repo:/root/.axon_site python exp/flash_split.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aki_tpu.ops import flash_mma as fm
from aki_tpu.ops.masks import MMASpec

B, T, H, D, DP = 16, 656, 32, 96, 128
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


def scan_bench(name, call, *ops):
    def run(x, *rest):
        def body(c, _):
            o = call(c, *rest)
            return (c + 0.001 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, x, None, length=LAYERS)
        return c.reshape(-1)[:8]

    ms = timeit(jax.jit(run), *ops) / LAYERS
    print(f"{name:56s} {ms:8.3f} ms/call", flush=True)


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

    scan_bench("a. full wrapper (prod)",
               lambda q, k, v: fm.flash_mma_attention(
                   q, k, v, spec=spec, kv_valid=kvv), q, k, v)

    t_pad = 768

    def relayout(x):
        xt = fm._pad_to(fm._pad_to(x, t_pad, 1), DP, 3)
        return xt.transpose(0, 2, 1, 3)

    def relayouts_only(q, k, v):
        qt, kt, vt = relayout(q), relayout(k), relayout(v)
        # output-side transpose back (use qt as a stand-in output)
        o = (qt + kt + vt).transpose(0, 2, 1, 3)[:, :T, :, :D]
        return o

    scan_bench("b. relayouts only (pad+transpose x3 + back)",
               relayouts_only, q, k, v)

    # c. bare kernel on pre-relayout operands
    qt, kt, vt = relayout(q), relayout(k), relayout(v)
    img_start, txt_start, txt_end, n_img = fm._normalize_spec(spec, B)
    kvp = fm._pad_to(kvv.astype(jnp.int32), t_pad, 1)[:, None, :]
    qoff = jnp.zeros((B,), jnp.int32)
    block_h = 8
    kernel = functools.partial(
        fm._kernel_1kv, block_q=t_pad, block_kv=t_pad,
        block_h=block_h, num_images=n_img, causal=True,
    )

    def bare(qt, kt, vt):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(B, H // block_h, 1, 1),
                in_specs=[
                    pl.BlockSpec((1, block_h, t_pad, DP),
                                 lambda b, h, qi, kj, *_: (b, h, 0, 0)),
                    pl.BlockSpec((1, block_h, t_pad, DP),
                                 lambda b, h, qi, kj, *_: (b, h, 0, 0)),
                    pl.BlockSpec((1, block_h, t_pad, DP),
                                 lambda b, h, qi, kj, *_: (b, h, 0, 0)),
                    pl.BlockSpec((1, 1, t_pad),
                                 lambda b, h, qi, kj, *_: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, block_h, t_pad, DP),
                                       lambda b, h, qi, kj, *_: (b, h, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, t_pad, DP), qt.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 4,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(img_start, txt_start, txt_end, qoff, qt, kt, vt, kvp)

    scan_bench("c. bare kernel, pre-relayout operands", bare, qt, kt, vt)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
