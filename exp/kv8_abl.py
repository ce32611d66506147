"""Where do int8-KV decode steps lose 5 ms vs bf16 (19.9 vs 14.9 ms/step)?

Isolates ONE decode step's attention path (no weight matmuls): a jitted
scan over the 32 stacked layers with the cache as donated carry, exactly
like decode_step's layer structure. Variants peel off pieces.

PYTHONPATH=/root/repo:/root/.axon_site python exp/kv8_abl.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops import decode_attention as da

L, B, S, H, D = 32, 16, 768, 32, 96
F = H * D
N = int(os.environ.get("N", "16"))


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, n=N):
    r = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), r)
    sync(jax.tree.leaves(r)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(jax.tree.leaves(r)[0].reshape(-1)[:1])
    return (time.perf_counter() - t0) / n * 1e3


def report(name, ms):
    print(f"{name:52s} {ms:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    k8 = jax.jit(lambda k: jax.random.randint(
        k, (L, B, S, F), -127, 127, jnp.int8))(key)
    v8 = jax.jit(lambda k: jax.random.randint(
        k, (L, B, S, F), -127, 127, jnp.int8))(key)
    ks = jax.jit(lambda k: jax.random.uniform(
        k, (L, B, S, H), jnp.float32, 0.01, 0.02))(key)
    vs = jax.jit(lambda k: jax.random.uniform(
        k, (L, B, S, H), jnp.float32, 0.01, 0.02))(key)
    kb = jax.jit(lambda k: (jax.random.normal(
        k, (L, B, S, H, D), jnp.bfloat16)))(key)
    vb = jax.jit(lambda k: (jax.random.normal(
        k, (L, B, S, H, D), jnp.bfloat16)))(key)
    q = jax.jit(lambda k: jax.random.normal(
        k, (B, 1, H, D), jnp.bfloat16))(key)
    lengths = jnp.full((B,), 704, jnp.int32)

    # -- 1. pure stream: how fast can the layer-scan read the int8 cache?
    def stream(k8_, v8_, q_):
        def body(acc, li):
            kl = jax.lax.dynamic_index_in_dim(k8_, li, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(v8_, li, 0, keepdims=False)
            # one int8 dot per buffer so the whole slice must be read
            s1 = jax.lax.dot_general(
                kl.reshape(B * S, F)[:8], kl.reshape(B * S, F),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
            s2 = jax.lax.dot_general(
                vl.reshape(B * S, F)[:8], vl.reshape(B * S, F),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
            return acc + jnp.sum(s1[:, ::128]) + jnp.sum(s2[:, ::128]), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                              jnp.arange(L))
        return acc

    ms = timeit(jax.jit(stream), k8, v8, q)
    gb = 2 * L * B * S * F / 1e9
    report(f"int8 stream only ({gb:.1f} GB)", ms)
    print(f"    -> {gb / (ms / 1e3):.0f} GB/s", flush=True)

    # bf16 stream for comparison
    def stream_b(kb_, vb_, q_):
        def body(acc, li):
            kl = jax.lax.dynamic_index_in_dim(kb_, li, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(vb_, li, 0, keepdims=False)
            s1 = jax.lax.dot_general(
                kl.reshape(B * S, F)[:8], kl.reshape(B * S, F),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s2 = jax.lax.dot_general(
                vl.reshape(B * S, F)[:8], vl.reshape(B * S, F),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            return acc + jnp.sum(s1[:, ::128]) + jnp.sum(s2[:, ::128]), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(L))
        return acc

    ms = timeit(jax.jit(stream_b), kb, vb, q)
    gb2 = 2 * L * B * S * H * D * 2 / 1e9
    report(f"bf16 stream only ({gb2:.1f} GB)", ms)
    print(f"    -> {gb2 / (ms / 1e3):.0f} GB/s", flush=True)

    # -- 2. full xla int8 attention per layer (no cache writes)
    def attn_full(k8_, ks_, v8_, vs_, q_):
        def body(acc, li):
            o = da.decode_attention_flat_xla(q_, k8_, ks_, v8_, vs_,
                                             lengths, li)
            return acc + jnp.sum(o[:, 0, 0, :8].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(L))
        return acc

    report("int8 xla attention x32 (no writes)",
           timeit(jax.jit(attn_full), k8, ks, v8, vs, q))

    # -- 2b. same but dots in bf16 (convert k/v slices): is int8 native?
    def attn_bf16dots(k8_, ks_, v8_, vs_, q_):
        def body(acc, li):
            kl = jax.lax.dynamic_index_in_dim(
                k8_, li, 0, keepdims=False).astype(jnp.bfloat16)
            vl = jax.lax.dynamic_index_in_dim(
                v8_, li, 0, keepdims=False).astype(jnp.bfloat16)
            ksl = jax.lax.dynamic_index_in_dim(
                ks_, li, 0, keepdims=False).transpose(0, 2, 1)
            vsl = jax.lax.dynamic_index_in_dim(
                vs_, li, 0, keepdims=False).transpose(0, 2, 1)
            qb, qsc = da.build_qblock(q_, H)
            s = jnp.einsum("bhf,bsf->bhs", qb.astype(jnp.bfloat16), kl,
                           preferred_element_type=jnp.float32)
            s = s * ksl * qsc[..., None] * (D ** -0.5)
            col = jax.lax.broadcasted_iota(jnp.int32, (B, 1, S), 2)
            s = jnp.where(col < lengths[:, None, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1) * vsl
            o = jnp.einsum("bhs,bsf->bhf", p.astype(jnp.bfloat16), vl,
                           preferred_element_type=jnp.float32)
            return acc + jnp.sum(o[:, 0, :8]), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(L))
        return acc

    report("int8 cache, bf16 dots x32",
           timeit(jax.jit(attn_bf16dots), k8, ks, v8, vs, q))

    # -- 2c. QK dot only (int8), no PV / softmax
    def attn_qk(k8_, ks_, v8_, vs_, q_):
        qb, qsc = da.build_qblock(q_, H)

        def body(acc, li):
            kl = jax.lax.dynamic_index_in_dim(k8_, li, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(v8_, li, 0, keepdims=False)
            s = jnp.einsum("bhf,bsf->bhs", qb, kl,
                           preferred_element_type=jnp.int32)
            s2 = jnp.einsum("bhf,bsf->bhs", qb, vl,
                            preferred_element_type=jnp.int32)
            return acc + jnp.sum(s[:, :, ::128]) + jnp.sum(s2[:, :, ::128]), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), jnp.arange(L))
        return acc

    report("int8 QK-style dots only x32 (k and v)",
           timeit(jax.jit(attn_qk), k8, ks, v8, vs, q))

    # -- 3. attention + the 4 per-layer cache scatters (decode_step shape)
    def attn_writes(k8_, ks_, v8_, vs_, q_):
        newk = jnp.ones((B, 1, F), jnp.int8)
        newsc = jnp.ones((B, 1, H), jnp.float32)
        wpos = lengths[:, None]

        def body(carry, li):
            ck8, cks, cv8, cvs, acc = carry
            from aki_tpu.models.phi3 import _scatter_flat
            ck8 = _scatter_flat(ck8, newk, li, wpos)
            cks = _scatter_flat(cks, newsc, li, wpos)
            cv8 = _scatter_flat(cv8, newk, li, wpos)
            cvs = _scatter_flat(cvs, newsc, li, wpos)
            o = da.decode_attention_flat_xla(q_, ck8, cks, cv8, cvs,
                                             lengths, li)
            return (ck8, cks, cv8, cvs,
                    acc + jnp.sum(o[:, 0, 0, :8].astype(jnp.float32))), None

        carry, _ = jax.lax.scan(body, (k8_, ks_, v8_, vs_, jnp.zeros(())),
                                jnp.arange(L))
        return carry[4]

    report("int8 attention + cache scatters x32",
           timeit(jax.jit(attn_writes, donate_argnums=(0, 1, 2, 3)),
                  k8, ks, v8, vs, q))
    # donated buffers are gone; stop here (weights path covered by
    # exp/mode_split.py e2e numbers)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} L={L} B={B} S={S} H={H} D={D}",
          flush=True)
    main()
