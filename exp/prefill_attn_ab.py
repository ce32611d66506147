"""A/B: decoder prefill attention — Pallas flash MMA vs plain-XLA MMA.

Round-3 won 0.45 img/s swapping the VISION tower's flash kernel for plain
XLA bf16-prob attention (commit 370fd24: Pallas is DMA-bound at ~175-245
GB/s while XLA streams the materialized probability tensor at ~450 GB/s).
This replays that A/B at DECODER prefill shapes (T≈656 spliced tokens,
32 heads, d=96, causal+MMA mask) where the flash kernel currently costs
~234 ms of the 2353 ms bs48 batch.

The XLA candidate computes the MMA predicate INLINE from the 3-scalar
spec (iota compares fuse into the score fusion — the (B,T,S) bool mask is
never a standalone HBM tensor) and keeps probabilities in bf16, exactly
like ops/attention.py:encoder_attention_xla.

PYTHONPATH=/root/repo:/root/.axon_site python exp/prefill_attn_ab.py [bs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aki_tpu.ops.masks import MMASpec
from aki_tpu.ops.flash_mma import flash_mma_attention

T, H, D = 656, 32, 96
NEG = -1e30


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


def mma_attention_xla(q, k, v, spec, kv_valid, scale):
    """(B,T,H,D) x3 -> (B,T,H,D); causal|MMA mask fused into the score
    computation; bf16 probabilities (encoder_attention_xla recipe)."""
    b, t, h, d = q.shape
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (b, 1, t, t), 2)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, 1, t, t), 3)
    i0 = spec.img_start[:, None, None, None]
    t0 = spec.txt_start[:, None, None, None]
    t1 = spec.txt_end[:, None, None, None]
    ok = (k_pos <= q_pos) | (
        (q_pos >= i0) & (q_pos < t0) & (k_pos >= t0) & (k_pos < t1))
    if kv_valid is not None:
        ok = ok & (kv_valid[:, None, None, :] != 0)
    s = jnp.where(ok, s, NEG)
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bthd", p, v,
                   preferred_element_type=jnp.float32)
    return (o / l.transpose(0, 2, 1, 3)).astype(q.dtype)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    L = 6
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3 * L)
    q = jnp.stack([jax.random.normal(ks[i], (b, T, H, D), jnp.bfloat16)
                   for i in range(L)])
    k = jnp.stack([jax.random.normal(ks[L + i], (b, T, H, D), jnp.bfloat16)
                   for i in range(L)])
    v = jnp.stack([jax.random.normal(ks[2 * L + i], (b, T, H, D),
                                     jnp.bfloat16) for i in range(L)])
    # AKI serving spec: image at 0, 144 vision tokens, question to ~600
    spec = MMASpec(
        img_start=jnp.zeros((b,), jnp.int32),
        txt_start=jnp.full((b,), 144, jnp.int32),
        txt_end=jnp.full((b,), 600, jnp.int32),
    )
    kv_valid = (jax.lax.broadcasted_iota(jnp.int32, (b, T), 1)
                < 640).astype(jnp.int32)
    scale = D ** -0.5

    @jax.jit
    def run_flash(q, k, v, spec, kv_valid):
        outs = []
        for li in range(L):
            outs.append(flash_mma_attention(
                q[li], k[li], v[li], spec=spec, kv_valid=kv_valid))
        return jnp.stack(outs)

    @jax.jit
    def run_xla(q, k, v, spec, kv_valid):
        outs = []
        for li in range(L):
            outs.append(mma_attention_xla(
                q[li], k[li], v[li], spec, kv_valid, scale))
        return jnp.stack(outs)

    t_f = timeit(lambda: run_flash(q, k, v, spec, kv_valid)) / L
    print(f"bs{b} T{T}: flash  {t_f * 1e3:6.2f} ms/layer", flush=True)
    t_x = timeit(lambda: run_xla(q, k, v, spec, kv_valid)) / L
    print(f"bs{b} T{T}: xla    {t_x * 1e3:6.2f} ms/layer", flush=True)

    # numerics check
    of = run_flash(q, k, v, spec, kv_valid)
    ox = run_xla(q, k, v, spec, kv_valid)
    err = float(jnp.max(jnp.abs(of.astype(jnp.float32)
                                - ox.astype(jnp.float32))))
    print(f"maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
