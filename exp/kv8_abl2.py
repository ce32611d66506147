"""Which int8-cache scatter copies: the flat (L,B,S,F) row write or the
scale write?

Mimics generate()'s real structure — cache as INTERNAL carry of a
steps x layers double scan inside one jit (no cross-call donation), so
XLA has the same aliasing freedom as the production path.

Measured (v5e, 2026-08-17, BEFORE the token-major fix; int8 dots):
    attn only (no writes)                          12.63 ms/step
    attn + flat int8 row scatters                  13.27
    attn + scale scatters head-major (L,B,H,S)     15.63   <- +3ms copies
    attn + both (then-production path)             16.28
    attn + both, scales token-major (L,B,S,H)      13.41   <- fix
    writes only, no attn                            8.93
-> the head-major scale scatter was a strided column write XLA kept as a
   copy; token-major (now the production layout) writes contiguous rows.
-> attn-only at 12.63 vs 6.58 when the cache is a plain jit arg: the
   batched int8 x int8 einsum lowers to a dilated conv that materializes
   the 37MB layer slice; bf16 dots with inline int8->bf16 convert (now
   production) fuse the slice into the operand read.

PYTHONPATH=/root/repo:/root/.axon_site python exp/kv8_abl2.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops import decode_attention as da
from aki_tpu.models.phi3 import _scatter_flat

L, B, S, H, D = 32, 16, 768, 32, 96
F = H * D
STEPS = 8
N = int(os.environ.get("N", "8"))


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, n=N):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3 / STEPS


def report(name, ms):
    print(f"{name:58s} {ms:8.2f} ms/step", flush=True)


def make(write_flat=True, write_scale=True, attn=True):
    def run(seed):
        key = jax.random.PRNGKey(seed)
        ck = jax.random.randint(key, (L, B, S, F), -127, 127, jnp.int8)
        cv = jax.random.randint(key, (L, B, S, F), -127, 127, jnp.int8)
        # token-major scales (the production layout after the fix)
        cks = jnp.full((L, B, S, H), 0.01, jnp.float32)
        cvs = jnp.full((L, B, S, H), 0.01, jnp.float32)
        q = jax.random.normal(key, (B, 1, H, D), jnp.bfloat16)
        newk = jnp.ones((B, 1, F), jnp.int8)
        newsc = jnp.ones((B, 1, H), jnp.float32)

        def step(carry, si):
            ck, cks, cv, cvs, lengths, acc = carry
            wpos = lengths[:, None]

            def layer(lcarry, li):
                ck, cks, cv, cvs, acc = lcarry
                if write_flat:
                    ck = _scatter_flat(ck, newk, li, wpos)
                    cv = _scatter_flat(cv, newk, li, wpos)
                if write_scale:
                    cks = _scatter_flat(cks, newsc, li, wpos)
                    cvs = _scatter_flat(cvs, newsc, li, wpos)
                if attn:
                    o = da.decode_attention_flat_xla(
                        q, ck, cks, cv, cvs, lengths + 1, li)
                    acc = acc + jnp.sum(o[:, 0, 0, :8].astype(jnp.float32))
                else:
                    acc = acc + jnp.sum(ck[li, :, 0, 0].astype(jnp.float32))
                return (ck, cks, cv, cvs, acc), None

            (ck, cks, cv, cvs, acc), _ = jax.lax.scan(
                layer, (ck, cks, cv, cvs, acc), jnp.arange(L))
            return (ck, cks, cv, cvs, lengths + 1, acc), None

        lengths = jnp.full((B,), 700, jnp.int32)
        (ck, cks, cv, cvs, lengths, acc), _ = jax.lax.scan(
            step, (ck, cks, cv, cvs, lengths, jnp.zeros(())),
            jnp.arange(STEPS))
        return acc

    return run


def main():
    for name, kw in [
        ("attn only (no writes)", dict(write_flat=False, write_scale=False)),
        ("attn + flat int8 row scatters", dict(write_scale=False)),
        ("attn + scale scatters token-major", dict(write_flat=False)),
        ("attn + both (production path)", dict()),
        ("writes only, no attn", dict(attn=False)),
    ]:
        f = jax.jit(make(**kw))
        report(name, timeit(f, 0))
        f = None
        jax.clear_caches()


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} steps={STEPS}", flush=True)
    main()
