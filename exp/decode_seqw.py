"""Does a static SEQ-prefix slice of the flat int8 cache fuse into the
decode contractions (like the live_width batch-prefix slice does)?

Serving motivation: mid-drain the longest live sequence is often far
below max_len (length-sorted cohorts decode at 450-600 of a 704-wide
cache), so a fused prefix read would cut the dominant decode bytes
proportionally. Compares, at bs48, the per-layer attention time of:

  full   — contraction over the whole (B, 704, F) layer slice
  sliced — same buffers, jit-internal k[:, :SW] static prefix slice
  ctrl   — cache ALLOCATED at (B, SW, F): the fusion upper bound

PYTHONPATH=/root/repo:/root/.axon_site python exp/decode_seqw.py [SW]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

S, F, H, D = 704, 3072, 32, 96
B = 48
L = 12


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, n=8):
    r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / n


def attn(qb, k, ks, v, vs, lengths, sw):
    k = k[:, :sw]
    v = v[:, :sw]
    ks = ks[:, :, :sw]
    vs = vs[:, :, :sw]
    s32 = jnp.einsum("bhf,bsf->bhs", qb, k.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    s = s32 * ks * (D ** -0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1, sw), 2)
    s = jnp.where(col < lengths[:, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    pv = (p * vs).astype(jnp.bfloat16)
    return jnp.einsum("bhs,bsf->bhf", pv, v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def run(sw, alloc):
    key = jax.random.PRNGKey(0)
    k8 = jax.random.randint(key, (L, B, alloc, F), -127, 127, jnp.int8)
    v8 = jax.random.randint(key, (L, B, alloc, F), -127, 127, jnp.int8)
    ks = jnp.ones((L, B, H, alloc), jnp.float32)
    vs = jnp.ones((L, B, H, alloc), jnp.float32)
    qb = jax.random.normal(key, (B, H, F), jnp.bfloat16)
    lengths = jnp.full((B,), min(600, sw), jnp.int32)

    @jax.jit
    def step(qb, k8, v8, ks, vs, lengths):
        acc = jnp.zeros((B, H, F), jnp.float32)
        for li in range(L):
            acc += attn(qb, k8[li], ks[li], v8[li], vs[li], lengths, sw)
        return acc

    t = timeit(lambda: step(qb, k8, v8, ks, vs, lengths))
    byts = L * B * sw * F * 2  # k+v int8 reads
    print(f"alloc={alloc} sw={sw}: {t * 1e3 / L:6.3f} ms/layer "
          f"({byts / t / 1e9:6.1f} GB/s on sliced bytes)", flush=True)
    # free before the next allocation (one chip, big buffers)
    del k8, v8, ks, vs
    return t


def main():
    sw = int(sys.argv[1]) if len(sys.argv) > 1 else 576
    print(f"backend={jax.default_backend()} B={B} S={S} L={L}", flush=True)
    run(S, S)        # full
    run(sw, S)       # sliced prefix of full-size buffers
    run(sw, sw)      # control: truly smaller cache
    run(448, S)      # deeper slice
    run(448, 448)


if __name__ == "__main__":
    main()
