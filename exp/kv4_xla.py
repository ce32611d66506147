"""Re-probe packed-int4 KV through the XLA inline-dequant decode path.

The round-3 verdict on int4 KV ("unreachable, 40 GB/s", exp/kv4_bw.py)
measured an INTERLEAVING unpack: ``stack([lo, hi], -1).reshape`` is a
minor-dim shuffle XLA materializes before the dot.  This probe uses a
**split-half packing** instead: byte c of a packed (B, S, F/2) uint8 row
holds channel c in the low nibble and channel c + F/2 in the high nibble.
Unpacking is then two arithmetic-shift expressions whose results are
consumed either as a CONCAT along the minor dim (F/2 = 1536 is a lane
multiple) or as two separate dots — no interleave anywhere.  Q columns
are permuted once (tiny) to match; for the PV dot the selector matrix
absorbs the output-channel permutation for free.

Decision rule (VERDICT r3 #3): if packed-int4 attention reads at
>= ~250 GB/s effective int8-equivalent bytes, int4 KV saves ~10 ms/step
at bs48 (+~2 img/s) and doubles KV capacity.  Below that, int8 stays.

PYTHONPATH=/root/repo:/root/.axon_site python exp/kv4_xla.py [bs]
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


def softmask(s, lengths):
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < lengths[:, None, None], s, -1e30)
    return jax.nn.softmax(s, axis=-1)


def unpack_lo(x):  # int8 (..., F/2) -> bf16 low nibbles in [-8, 7]
    return jnp.right_shift(jnp.left_shift(x, 4), 4).astype(jnp.bfloat16)


def unpack_hi(x):
    return jnp.right_shift(x, 4).astype(jnp.bfloat16)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    L = 12 if b >= 48 else 32
    key = jax.random.PRNGKey(0)
    qb = jax.random.normal(key, (b, H, F), jnp.bfloat16)
    lengths = jnp.full((b,), 600, jnp.int32)
    ks = jnp.ones((L, b, H, S), jnp.float32)
    vs = jnp.ones((L, b, H, S), jnp.float32)

    # ---------- int8 baseline ------------------------------------------
    k8 = jax.random.randint(key, (L, b, S, F), -127, 127, jnp.int8)
    v8 = jax.random.randint(key, (L, b, S, F), -127, 127, jnp.int8)

    def attn8(qb, k, v, ksl, vsl):
        s = jnp.einsum("bhf,bsf->bhs", qb, k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        p = softmask(s * ksl * (D ** -0.5), lengths)
        pv = (p * vsl).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bsf->bhf", pv, v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @jax.jit
    def run8(qb, k8, v8, ks, vs):
        return jnp.stack([attn8(qb, k8[li], v8[li], ks[li], vs[li])
                          for li in range(L)])

    t = timeit(lambda: run8(qb, k8, v8, ks, vs)) / L
    gb8 = 2 * b * S * F / 1e9
    print(f"bs{b}: int8 baseline        {t * 1e3:6.2f} ms/layer "
          f"| {gb8 / t:6.1f} GB/s", flush=True)
    for buf in (k8, v8):
        buf.delete()
    del k8, v8

    # ---------- packed int4, split-half, CONCAT variant ----------------
    kp = jax.random.randint(key, (L, b, S, F // 2), -128, 127, jnp.int8)
    vp = jax.random.randint(key, (L, b, S, F // 2), -128, 127, jnp.int8)
    gb4 = b * S * F / 1e9  # K+V packed bytes per layer

    def attn4_concat(qb, kpl, vpl, ksl, vsl):
        k = jnp.concatenate([unpack_lo(kpl), unpack_hi(kpl)], axis=-1)
        s = jnp.einsum("bhf,bsf->bhs", qb, k,
                       preferred_element_type=jnp.float32)
        p = softmask(s * ksl * (D ** -0.5), lengths)
        pv = (p * vsl).astype(jnp.bfloat16)
        v = jnp.concatenate([unpack_lo(vpl), unpack_hi(vpl)], axis=-1)
        return jnp.einsum("bhs,bsf->bhf", pv, v,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def run4c(qb, kp, vp, ks, vs):
        return jnp.stack([attn4_concat(qb, kp[li], vp[li], ks[li], vs[li])
                          for li in range(L)])

    t = timeit(lambda: run4c(qb, kp, vp, ks, vs)) / L
    print(f"bs{b}: int4 split-concat    {t * 1e3:6.2f} ms/layer "
          f"| {gb4 / t:6.1f} GB/s packed ({2 * gb4 / t:6.1f} eff)",
          flush=True)

    # ---------- packed int4, TWO-DOT variant ----------------------------
    qlo, qhi = qb[..., : F // 2], qb[..., F // 2:]

    def attn4_twodot(qlo, qhi, kpl, vpl, ksl, vsl):
        s = (jnp.einsum("bhf,bsf->bhs", qlo, unpack_lo(kpl),
                        preferred_element_type=jnp.float32)
             + jnp.einsum("bhf,bsf->bhs", qhi, unpack_hi(kpl),
                          preferred_element_type=jnp.float32))
        p = softmask(s * ksl * (D ** -0.5), lengths)
        pv = (p * vsl).astype(jnp.bfloat16)
        olo = jnp.einsum("bhs,bsf->bhf", pv, unpack_lo(vpl),
                         preferred_element_type=jnp.float32)
        ohi = jnp.einsum("bhs,bsf->bhf", pv, unpack_hi(vpl),
                         preferred_element_type=jnp.float32)
        return olo + ohi  # stand-in combine; real path uses the selector

    @jax.jit
    def run4d(qlo, qhi, kp, vp, ks, vs):
        return jnp.stack([attn4_twodot(qlo, qhi, kp[li], vp[li],
                                       ks[li], vs[li])
                          for li in range(L)])

    t = timeit(lambda: run4d(qlo, qhi, kp, vp, ks, vs)) / L
    print(f"bs{b}: int4 two-dot         {t * 1e3:6.2f} ms/layer "
          f"| {gb4 / t:6.1f} GB/s packed ({2 * gb4 / t:6.1f} eff)",
          flush=True)

    # ---------- pure unpack-read control (no dots) ----------------------
    @jax.jit
    def read4(kp, vp):
        outs = []
        for li in range(L):
            outs.append(
                jnp.max(unpack_lo(kp[li]).astype(jnp.float32), axis=(1, 2))
                + jnp.max(unpack_hi(vp[li]).astype(jnp.float32),
                          axis=(1, 2)))
        return jnp.stack(outs)

    t = timeit(lambda: read4(kp, vp)) / L
    print(f"bs{b}: int4 unpack-reduce   {t * 1e3:6.2f} ms/layer "
          f"| {gb4 / t:6.1f} GB/s packed", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
