"""What HBM->VMEM bandwidth can a Pallas kernel actually reach?

Three harnesses over the same ~1.5 GB of int8/bf16 reads:
  a. auto-pipelined pallas_call (BlockSpec streaming), reduce-only kernel
  b. manual multi-slot DMA (decode-kernel style: N_BUFFERS async copies
     in flight), reduce-only
  c. XLA reduce over the same bytes (the ~390-530 GB/s reference)

PYTHONPATH=/root/repo:/root/.axon_site python exp/dma_rate.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 96 * 768, 3072
L = 10  # slabs per jit call (amortize tunnel dispatch)
N = 8


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


def bench(name, fn, x, bytes_):
    ms = timeit(fn, x)
    print(f"{name:52s} {ms:8.2f} ms | {bytes_ / (ms / 1e3) / 1e9:6.1f} GB/s",
          flush=True)


def auto_kernel(x_ref, o_ref):
    # touch one row only — the BlockSpec DMAs the whole block regardless,
    # so this measures the pipeline, not the VPU
    o_ref[...] = x_ref[:1, :].astype(jnp.float32)


def make_auto(x, block_r):
    grid = (x.shape[1] // block_r,)
    call = pl.pallas_call(
        auto_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_r, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    @jax.jit
    def run(x):
        outs = [call(x[i]) for i in range(L)]
        return sum(outs)

    return run


def manual_kernel(x_hbm, o_ref, bufs, sems, *, block_r, nbuf, nblocks):
    def dma(j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(j * block_r, block_r), :],
            bufs.at[slot], sems.at[slot],
        )

    for s in range(nbuf - 1):
        if s < nblocks:
            dma(s, s).start()

    def body(j, acc):
        slot = j % nbuf
        ahead = j + nbuf - 1
        ja = jnp.minimum(ahead, nblocks - 1)

        @pl.when(ahead < nblocks)
        def _():
            dma(ja, ahead % nbuf).start()

        dma(j, slot).wait()
        return acc + bufs[slot][:1, :].astype(jnp.float32)

    acc = jnp.zeros((1, C), jnp.float32)
    o_ref[...] = jax.lax.fori_loop(0, nblocks, body, acc)


def make_manual(x, block_r, nbuf):
    nblocks = x.shape[1] // block_r
    kernel = functools.partial(manual_kernel, block_r=block_r, nbuf=nbuf,
                               nblocks=nblocks)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, C), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, block_r, C), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    @jax.jit
    def run(x):
        outs = [call(x[i]) for i in range(L)]
        return sum(outs)

    return run


def main():
    for dtype, nbytes in ((jnp.int8, 1), (jnp.bfloat16, 2)):
        x = jax.random.randint(jax.random.PRNGKey(0), (L, R, C), -127, 127,
                               jnp.int8).astype(dtype)
        total = L * R * C * nbytes
        print(f"--- dtype {dtype.__name__}, {total/1e6:.0f} MB ---",
              flush=True)

        if dtype == jnp.bfloat16:
            bench("xla row0-sum (stream ref)", jax.jit(
                lambda x: sum(x[i, :1, :].astype(jnp.float32) + x[i, R//2:R//2+1, :].astype(jnp.float32)
                              for i in range(L))), x, 0.0001 + 0 * total)

        for br in (768, 1536):
            bench(f"auto pipeline block_r={br}", make_auto(x, br), x, total)
        for nbuf in (2, 3, 4):
            bench(f"manual DMA block_r=768 nbuf={nbuf}",
                  make_manual(x, 768, nbuf), x, total)
        x.delete()


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
