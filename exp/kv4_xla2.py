"""int4 KV probe, round 2: single-dot broadcast-unpack variants.

exp/kv4_xla.py showed the arithmetic-shift nibble unpack FUSES into the
dot operand read (two-dot runs at the full ~315 GB/s XLA streaming rate)
— but two separate dots read the packed buffer twice, cancelling the
byte saving.  These variants express the unpack as ONE dot whose operand
is an elementwise broadcast of the packed bytes (no concat/interleave):

  K2[b, s, j, c] = (kp[b, s, c] << (4*(1-j))) >> 4      j in {0, 1}
  scores = einsum("bhjf,bsjf->bhs", q2, K2)

so the flattened contraction layout [lo-block, hi-block] matches a
once-permuted Q, and the packed bytes are read once IF XLA fuses the
broadcast into the operand.

PYTHONPATH=/root/repo:/root/.axon_site python exp/kv4_xla2.py [bs]
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


SHIFTS = jnp.asarray([4, 0], jnp.int8)  # j=0 -> lo, j=1 -> hi


def unpack3d(x):  # (b, S, F/2) int8 -> (b, S, 2, F/2) bf16
    return jnp.right_shift(
        jnp.left_shift(x[:, :, None, :], SHIFTS[None, None, :, None]), 4
    ).astype(jnp.bfloat16)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    L = 12 if b >= 48 else 32
    key = jax.random.PRNGKey(0)
    qb = jax.random.normal(key, (b, H, F), jnp.bfloat16)
    q2 = qb.reshape(b, H, 2, F // 2)  # [.,.,0]=first half, [.,.,1]=second
    lengths = jnp.full((b,), 600, jnp.int32)
    ks = jnp.ones((L, b, H, S), jnp.float32)
    vs = jnp.ones((L, b, H, S), jnp.float32)

    kp = jax.random.randint(key, (L, b, S, F // 2), -128, 127, jnp.int8)
    vp = jax.random.randint(key, (L, b, S, F // 2), -128, 127, jnp.int8)
    gb4 = b * S * F / 1e9  # K+V packed bytes per layer

    # ---------- single-dot, (j, f) contraction ---------------------------
    def attn_j(q2, kpl, vpl, ksl, vsl):
        s = jnp.einsum("bhjf,bsjf->bhs", q2, unpack3d(kpl),
                       preferred_element_type=jnp.float32)
        p = softmask(s * ksl * (D ** -0.5), lengths)
        pv = (p * vsl).astype(jnp.bfloat16)
        # V: output channels split [lo->first half, hi->second half]
        o2 = jnp.einsum("bhs,bsjf->bhjf", pv, unpack3d(vpl),
                        preferred_element_type=jnp.float32)
        return o2.reshape(b, H, F)

    @jax.jit
    def run_j(q2, kp, vp, ks, vs):
        return jnp.stack([attn_j(q2, kp[li], vp[li], ks[li], vs[li])
                          for li in range(L)])

    t = timeit(lambda: run_j(q2, kp, vp, ks, vs)) / L
    print(f"bs{b}: int4 1-dot (j,f)     {t * 1e3:6.2f} ms/layer "
          f"| {gb4 / t:6.1f} GB/s packed ({2 * gb4 / t:6.1f} eff)",
          flush=True)

    # ---------- K-only comparison: two-dot vs 1-dot ----------------------
    qlo, qhi = qb[..., : F // 2], qb[..., F // 2:]

    def lo(x):
        return jnp.right_shift(jnp.left_shift(x, 4), 4).astype(jnp.bfloat16)

    def hi(x):
        return jnp.right_shift(x, 4).astype(jnp.bfloat16)

    @jax.jit
    def runk2(qlo, qhi, kp):
        return jnp.stack([
            jnp.einsum("bhf,bsf->bhs", qlo, lo(kp[li]),
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bhf,bsf->bhs", qhi, hi(kp[li]),
                         preferred_element_type=jnp.float32)
            for li in range(L)])

    gbk = b * S * F / 2 / 1e9
    t = timeit(lambda: runk2(qlo, qhi, kp)) / L
    print(f"bs{b}: K two-dot            {t * 1e3:6.2f} ms/layer "
          f"| {gbk / t:6.1f} GB/s packed", flush=True)

    @jax.jit
    def runk1(q2, kp):
        return jnp.stack([
            jnp.einsum("bhjf,bsjf->bhs", q2, unpack3d(kp[li]),
                       preferred_element_type=jnp.float32)
            for li in range(L)])

    t = timeit(lambda: runk1(q2, kp)) / L
    print(f"bs{b}: K 1-dot (j,f)        {t * 1e3:6.2f} ms/layer "
          f"| {gbk / t:6.1f} GB/s packed", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
