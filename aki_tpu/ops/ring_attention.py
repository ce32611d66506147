"""Ring sequence-parallel MMA attention — the long-context SP design.

``flash_mma_attention_sp`` (ops/flash_mma.py:804) all-gathers K/V onto
every ``seq``-axis device before running the kernel, so per-device KV
memory stays O(T) however many devices shard the sequence — it shards
activations, not the attention working set. This module is the honest
long-context version (SURVEY §5 frames SP as *the* long-context hook):
K/V — and the K/V validity row — stay sharded; each of the ``n_seq``
ring steps evaluates the local query rows against ONE resident K/V block
and then rotates the blocks a hop around the ring with
``jax.lax.ppermute``. Per-device KV residency is O(T / n_seq) in BOTH
directions: the backward is its own reverse ring (``custom_vjp``) that
rotates (k, v, dk, dv) as a unit — n rotations return every block and
its accumulated gradient to the home shard — so no full-length K/V
tensor is ever materialized on any device.

Design notes (tpu-first):

- The per-block inner attention is plain XLA einsum + masked online
  softmax with fp32 accumulation, not the Pallas flash kernel: measured
  on v5e, XLA bf16-prob attention beats the Pallas-DMA-bound kernel at
  encoder and decoder-prefill shapes (PERF.md), and the block predicate
  stays in one place — ``ops/masks.py:allowed_mask`` with ``kv_offset``
  giving the remote block its absolute key positions.
- Dead blocks are skipped with ``lax.cond``: a block is dead when no
  (q, k) pair is allowed — entirely ahead of the causal frontier and
  outside every MMA rectangle. Device i therefore computes ~(i+1)/n of
  its steps plus MMA-rectangle landings, preserving the causal-triangle
  saving. (The MMA mask makes future blocks reachable: vision rows
  attend to the question span, which may live in a later shard — the
  predicate, not the step index, decides liveness.)
- Running stats (m, l, o) are fp32 regardless of input dtype; the
  final normalization guards l = 0 rows (fully-padded queries), and the
  finite ``NEG_INF`` arithmetic is floored so fully-masked rows produce
  exact zero probabilities instead of exp(NEG_INF - NEG_INF) = 1.

The reference has no sequence parallelism at all (torch SDPA over full
sequences, ``vlm.py``); this is a beyond-reference capability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .flash_mma import _normalize_spec, _shard_map
from .masks import NEG_INF, MMASpec, allowed_mask

__all__ = ["ring_mma_attention_sp", "SP_IMPL"]

# Which SP attention the decoder uses when sp_mesh is set:
#   "ring"      — this module (K/V stay sharded; O(T/n) per-device KV)
#   "allgather" — flash_mma_attention_sp (activation sharding only)
SP_IMPL = "ring"

_FLOOR = -1e30  # finite exponent floor: exp(x - _FLOOR) == 0 for x ~ NEG_INF


def _rotate(axis, n, xs):
    """One ring hop: shard i's payload moves to shard (i + 1) % n."""
    perm = [(i, (i + 1) % n) for i in range(n)]
    return tuple(jax.lax.ppermute(x, axis, perm) for x in xs)


def _block_scores(q, k_c, ok, scale):
    """Masked (B, H, Tq, Tk) scores, fp32, MXU-accumulated from the input
    dtype (bf16 operands in serving/training; the conftest precision pin
    governs fp32 CPU tests)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k_c,
                   preferred_element_type=jnp.float32)
    return jnp.where(ok[:, None], s * scale, NEG_INF)


def _ring_fwd_impl(axis, n, scale, q, k, v, kvv, i0, t0, t1, q_off):
    b, tl, h, _ = q.shape
    dv = v.shape[-1]
    me = jax.lax.axis_index(axis)
    q_abs = q_off + me * tl                        # (B,) absolute row base
    spec = MMASpec(i0, t0, t1)

    o0 = jnp.zeros((b, h, tl, dv), jnp.float32)
    m0 = jnp.full((b, h, tl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, tl), jnp.float32)

    def step(carry, s_idx):
        k_c, v_c, kvv_c, o, m, l = carry
        src = jnp.remainder(me - s_idx, n)         # home shard of the block
        ok = allowed_mask(spec, tl, tl, kvv_c,
                          q_offset=q_abs, kv_offset=src * tl)

        def live(oml):
            o, m, l = oml
            s = _block_scores(q, k_c, ok, scale)
            m_new = jnp.maximum(m, s.max(-1))
            m_ref = jnp.maximum(m_new, _FLOOR)     # fully-masked-row floor
            p = jnp.exp(s - m_ref[..., None])
            corr = jnp.exp(m - m_ref)
            l_new = l * corr + p.sum(-1)
            o_new = o * corr[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p.astype(v_c.dtype), v_c,
                preferred_element_type=jnp.float32)
            return o_new, m_new, l_new

        o, m, l = jax.lax.cond(jnp.any(ok), live, lambda x: x, (o, m, l))
        k_c, v_c, kvv_c = _rotate(axis, n, (k_c, v_c, kvv_c))
        return (k_c, v_c, kvv_c, o, m, l), None

    (_, _, _, o, m, l), _ = jax.lax.scan(
        step, (k, v, kvv, o0, m0, l0), jnp.arange(n))
    out_n = o / jnp.maximum(l, 1e-30)[..., None]   # (B, H, T, D) fp32
    # lse chosen so that exp(score - lse) reproduces p in the backward:
    # dead rows get lse = 0 (finite) so exp(NEG_INF - 0) == 0 exactly.
    lse = jnp.where(l > 0, jnp.maximum(m, _FLOOR) + jnp.log(
        jnp.maximum(l, 1e-30)), 0.0)
    out = out_n.transpose(0, 2, 1, 3).astype(q.dtype)
    return out, (q, k, v, kvv, i0, t0, t1, q_off, out_n, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ring(axis, n, scale, q, k, v, kvv, i0, t0, t1, q_off):
    out, _ = _ring_fwd_impl(axis, n, scale, q, k, v, kvv, i0, t0, t1, q_off)
    return out


def _ring_fwd(axis, n, scale, q, k, v, kvv, i0, t0, t1, q_off):
    return _ring_fwd_impl(axis, n, scale, q, k, v, kvv, i0, t0, t1, q_off)


def _ring_bwd(axis, n, scale, res, g):
    q, k, v, kvv, i0, t0, t1, q_off, out_n, lse = res
    b, tl, h, d = q.shape
    me = jax.lax.axis_index(axis)
    q_abs = q_off + me * tl
    spec = MMASpec(i0, t0, t1)

    gt = g.astype(jnp.float32).transpose(0, 2, 1, 3)     # (B, H, T, D)
    delta = jnp.sum(gt * out_n, -1)                      # (B, H, T)
    gt_c = gt.astype(q.dtype)

    dq0 = jnp.zeros((b, tl, h, d), jnp.float32)
    dk0 = jnp.zeros_like(k, jnp.float32)
    dv0 = jnp.zeros_like(v, jnp.float32)

    def step(carry, s_idx):
        k_c, v_c, kvv_c, dk_c, dv_c, dq = carry
        src = jnp.remainder(me - s_idx, n)
        ok = allowed_mask(spec, tl, tl, kvv_c,
                          q_offset=q_abs, kv_offset=src * tl)

        def live(args):
            dk_c, dv_c, dq = args
            s = _block_scores(q, k_c, ok, scale)
            p = jnp.exp(s - lse[..., None])              # (B, H, Tq, Tk)
            pc = p.astype(q.dtype)
            dv_blk = jnp.einsum("bhqk,bhqd->bkhd", pc, gt_c,
                                preferred_element_type=jnp.float32)
            dp = jnp.einsum("bhqd,bkhd->bhqk", gt_c, v_c,
                            preferred_element_type=jnp.float32)
            ds = (p * (dp - delta[..., None]) * scale).astype(q.dtype)
            dq_blk = jnp.einsum("bhqk,bkhd->bqhd", ds, k_c,
                                preferred_element_type=jnp.float32)
            dk_blk = jnp.einsum("bhqk,bqhd->bkhd", ds, q,
                                preferred_element_type=jnp.float32)
            return dk_c + dk_blk, dv_c + dv_blk, dq + dq_blk

        dk_c, dv_c, dq = jax.lax.cond(
            jnp.any(ok), live, lambda x: x, (dk_c, dv_c, dq))
        # k/v/kvv and their gradient accumulators rotate as a unit: after
        # the full loop (n hops) each block's dk/dv land back home.
        k_c, v_c, kvv_c, dk_c, dv_c = _rotate(
            axis, n, (k_c, v_c, kvv_c, dk_c, dv_c))
        return (k_c, v_c, kvv_c, dk_c, dv_c, dq), None

    (_, _, _, dk, dv, dq), _ = jax.lax.scan(
        step, (k, v, kvv, dk0, dv0, dq0), jnp.arange(n))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None, None, None, None)


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_mma_attention_sp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    axis: str = "seq",
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    scale: float | None = None,
    head_dim: int | None = None,
    **_kw,
) -> jax.Array:
    """Drop-in for ``flash_mma_attention_sp`` with sharded-K/V semantics.

    q/k/v ``(B, T, H, D)`` shard along T over ``axis``; ``kv_valid``
    ``(B, T)`` shards with them (it travels the ring alongside its K/V
    block). Batch keeps its (data, fsdp) sharding and heads keep their
    ``tensor`` sharding, so ring SP composes with dp/fsdp/tp in one
    shard_map. Extra kwargs (the flash kernel's block sizes) are accepted
    and ignored — block structure here is the shard itself.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()
    names = set(mesh.shape)
    batch = tuple(a for a in ("data", "fsdp") if a in names) or None
    heads = "tensor" if "tensor" in names else None

    b, t, _, d = q.shape
    n = mesh.shape[axis]
    if t % n:
        raise ValueError(
            f"sequence length {t} must divide the '{axis}' axis ({n}); "
            f"pad the spliced sequence to a multiple (the data layer's "
            f"length buckets can guarantee this)")
    if scale is None:
        scale = float(head_dim or d) ** -0.5
    i0, t0, t1, _ = _normalize_spec(spec, b)
    if kv_valid is None:
        kv_valid = jnp.ones((b, t), jnp.int32)
    kv_valid = kv_valid.astype(jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))

    sharded = P(batch, axis, heads, None)
    rep = P(batch)

    local = functools.partial(_ring, axis, n, scale)
    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, P(batch, axis),
                  rep, rep, rep, rep),
        out_specs=sharded,
    )(q, k, v, kv_valid, i0, t0, t1, q_offset)
