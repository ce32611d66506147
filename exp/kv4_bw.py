"""Can int4 KV halve the decode cache read on this stack?

Probes, on the real chip at decode shapes (S=704, F=3072):
  1. int4 arrays as jit args through the axon plugin (known int4 transfer
     bug — does an ON-DEVICE int4 jit arg work at all?)
  2. achieved GB/s of the decode attention einsums with an int4 cache
     converted inline to bf16, vs the int8 baseline
  3. packed-nibble int8 variant (two int4 per int8 byte, unpacked in the
     consumer) in case native int4 breaks

PYTHONPATH=/root/repo:/root/.axon_site python exp/kv4_bw.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

S, F, H, D = 704, 3072, 32, 96


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


def attn(qb, k, v, lengths, ks, vs):
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    L = 12 if b >= 48 else 32
    key = jax.random.PRNGKey(0)
    qb = jax.random.normal(key, (b, H, F), jnp.bfloat16)
    lengths = jnp.full((b,), 600, jnp.int32)
    ks = jnp.ones((L, b, H, S), jnp.float32)
    vs = jnp.ones((L, b, H, S), jnp.float32)

    # --- 1) int4 on-device jit arg probe -------------------------------
    try:
        k4 = jax.jit(lambda k: jax.random.randint(
            k, (L, b, S, F), -7, 7, jnp.int8).astype(jnp.int4))(key)
        v4 = jax.jit(lambda k: jax.random.randint(
            k, (L, b, S, F), -7, 7, jnp.int8).astype(jnp.int4))(
                jax.random.PRNGKey(1))

        @jax.jit
        def run4(qb, k4, v4, ks, vs, lengths):
            outs = []
            for li in range(L):
                outs.append(attn(qb, k4[li], v4[li], lengths,
                                 ks[li], vs[li]))
            return jnp.stack(outs)

        t = timeit(lambda: run4(qb, k4, v4, ks, vs, lengths)) / L
        gb = b * S * F / 1e9  # K + V int4 bytes per layer (packed)
        print(f"bs{b}: int4 attn {t * 1e3:6.2f} ms/layer | {gb:5.2f} GB "
              f"| {gb / t:6.1f} GB/s", flush=True)
        for buf in (k4, v4):
            buf.delete()
    except Exception as e:  # noqa: BLE001
        print(f"bs{b}: int4 jit-arg path FAILED: "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # --- 2) int8 baseline (same harness) --------------------------------
    k8 = jax.random.randint(key, (L, b, S, F), -127, 127, jnp.int8)
    v8 = jax.random.randint(key, (L, b, S, F), -127, 127, jnp.int8)

    @jax.jit
    def run8(qb, k8, v8, ks, vs, lengths):
        outs = []
        for li in range(L):
            outs.append(attn(qb, k8[li], v8[li], lengths, ks[li], vs[li]))
        return jnp.stack(outs)

    t = timeit(lambda: run8(qb, k8, v8, ks, vs, lengths)) / L
    gb8 = 2 * b * S * F / 1e9
    print(f"bs{b}: int8 attn {t * 1e3:6.2f} ms/layer | {gb8:5.2f} GB "
          f"| {gb8 / t:6.1f} GB/s", flush=True)

    # --- 3) packed-nibble int8 (unpack in consumer) ----------------------
    kp = jax.random.randint(key, (L, b, S, F // 2), -128, 127, jnp.int8)
    vp = jax.random.randint(key, (L, b, S, F // 2), -128, 127, jnp.int8)

    def unpack(x):  # (.., F//2) int8 -> (.., F) bf16, nibbles [-8, 7]
        lo = jnp.left_shift(x, 4)
        lo = jnp.right_shift(lo, 4)
        hi = jnp.right_shift(x, 4)
        return jnp.stack([lo, hi], axis=-1).reshape(
            *x.shape[:-1], x.shape[-1] * 2).astype(jnp.bfloat16)

    @jax.jit
    def runp(qb, kp, vp, ks, vs, lengths):
        outs = []
        for li in range(L):
            k = unpack(kp[li])
            v = unpack(vp[li])
            outs.append(attn(qb, k, v, lengths, ks[li], vs[li]))
        return jnp.stack(outs)

    t = timeit(lambda: runp(qb, kp, vp, ks, vs, lengths)) / L
    gb = b * S * F / 1e9
    print(f"bs{b}: packed-nibble attn {t * 1e3:6.2f} ms/layer | {gb:5.2f} GB "
          f"| {gb / t:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
