"""Achieved HBM bandwidth of the decode attention reads at bs16 vs bs48.

Isolates the two cache contractions of decode_attention_flat_xla (qk dot +
pv dot with inline int8->bf16 convert) from the rest of the decode step,
and compares against a pure bf16 stream of the same bytes.

PYTHONPATH=/root/repo:/root/.axon_site python exp/decode_bw.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

S, F, H, D = 704, 3072, 32, 96
L = 32  # layers per jit call (amortize tunnel dispatch); halved at bs48 (HBM)


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


def attn_once(qb, k, ks, v, vs, lengths):
    s32 = jnp.einsum("bhf,bsf->bhs", qb, k.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    s = s32 * ks * (D ** -0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1, S), 2)
    s = jnp.where(col < lengths[:, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    pv = (p * vs).astype(jnp.bfloat16)
    return jnp.einsum("bhs,bsf->bhf", pv, v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def main():
    # one batch size per process (pass as argv[1]) — buffers from a previous
    # batch linger on-device through the axon tunnel and OOM bs48
    global L
    for b in ([int(sys.argv[1])] if len(sys.argv) > 1 else [16, 48]):
        L = 12 if b >= 48 else 32
        key = jax.random.PRNGKey(0)
        k8 = jax.random.randint(key, (L, b, S, F), -127, 127, jnp.int8)
        v8 = jax.random.randint(key, (L, b, S, F), -127, 127, jnp.int8)
        ks = jnp.ones((L, b, H, S), jnp.float32)
        vs = jnp.ones((L, b, H, S), jnp.float32)
        qb = jax.random.normal(key, (b, H, F), jnp.bfloat16)
        lengths = jnp.full((b,), 600, jnp.int32)

        @jax.jit
        def run(qb, k8, ks, v8, vs, lengths):
            outs = []
            for li in range(L):
                outs.append(attn_once(qb, k8[li], ks[li], v8[li], vs[li],
                                      lengths))
            return jnp.stack(outs)

        t = timeit(lambda: run(qb, k8, ks, v8, vs, lengths)) / L
        gb = 2 * b * S * F / 1e9          # K + V int8 bytes per layer
        print(f"bs{b}: attn {t * 1e3:6.2f} ms/layer | cache {gb:5.2f} GB "
              f"| {gb / t:6.1f} GB/s", flush=True)

        # non-dot control first (reuses k8/v8), then free them before the
        # bf16 buffers are allocated — both sets at once OOM at bs48.
        @jax.jit
        def reduce_all(k8, v8):
            outs = []
            for li in range(L):
                outs.append(jnp.max(k8[li], axis=(1, 2)).astype(jnp.int32)
                            + jnp.max(v8[li], axis=(1, 2)).astype(jnp.int32))
            return jnp.stack(outs)

        t = timeit(lambda: reduce_all(k8, v8)) / L
        print(f"bs{b}: pure int8 read-reduce  {t * 1e3:6.2f} ms/layer "
              f"| {gb / t:6.1f} GB/s", flush=True)

        # wider-M control: does the qk dot speed up when M rows grow?
        for m in (128, 256):
            qw = jax.random.normal(key, (b, m, F), jnp.bfloat16)

            @jax.jit
            def run_wide(qw, k8):
                outs = []
                for li in range(L):
                    outs.append(jnp.einsum(
                        "bhf,bsf->bhs", qw, k8[li].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32))
                return jnp.stack(outs)

            t = timeit(lambda: run_wide(qw, k8)) / L
            gbk = b * S * F / 1e9
            print(f"bs{b}: qk dot M={m:4d}       {t * 1e3:6.2f} ms/layer "
                  f"| {gbk / t:6.1f} GB/s (K only)", flush=True)

        for buf in (k8, v8, ks, vs):
            buf.delete()
        del k8, v8, ks, vs

        # pure bf16 stream of the same byte count for comparison
        kb = jax.random.normal(key, (L, b, S, F // 2), jnp.bfloat16)
        vb = jax.random.normal(key, (L, b, S, F // 2), jnp.bfloat16)

        @jax.jit
        def run_bf(qh, kb, vb, lengths):
            outs = []
            for li in range(L):
                s32 = jnp.einsum("bhf,bsf->bhs", qh, kb[li],
                                 preferred_element_type=jnp.float32)
                p = jax.nn.softmax(s32, axis=-1)
                outs.append(jnp.einsum("bhs,bsf->bhf", p.astype(jnp.bfloat16),
                                       vb[li],
                                       preferred_element_type=jnp.float32))
            return jnp.stack(outs)

        qh = jax.random.normal(key, (b, H, F // 2), jnp.bfloat16)
        t = timeit(lambda: run_bf(qh, kb, vb, lengths)) / L
        print(f"bs{b}: bf16 stream same bytes {t * 1e3:6.2f} ms/layer "
              f"| {gb / t:6.1f} GB/s", flush=True)
        for buf in (kb, vb):
            buf.delete()
        del kb, vb


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
