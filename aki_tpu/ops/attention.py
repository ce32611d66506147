"""Attention entry points: dense reference + dispatch to the Pallas kernel.

``dense_attention`` is the numerics oracle: a straightforward
softmax(QK^T/sqrt(d) + bias)V evaluated in fp32, with the MMA mask built
from an :class:`~aki_tpu.ops.masks.MMASpec`.  It matches the reference's
behavior (HF SDPA over the inverted 4D mask, ``src/vlm.py:410-443``) and is
used by tests and as the fallback on CPU.

``mma_attention`` dispatches to the Pallas flash kernel on TPU (static-shape
friendly, never materializes the (T, T) mask in HBM) and to the dense path
elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .masks import MMASpec, allowed_mask


def dense_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    causal: bool = True,
    scale: float | None = None,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Reference multi-head attention.

    Args:
        q: (B, T, H, D)
        k, v: (B, S, Hkv, D) — Hkv may divide H (GQA).
        spec: MMA block spec; ``None`` with ``causal=True`` gives plain
            causal, ``None`` with ``causal=False`` gives full attention.
        kv_valid: (B, S) 0/1 key validity.
        q_offset: absolute position of q[0] (scalar or (B,)) for decode.
        bias: optional additive (B, 1or H, T, S) bias (e.g. for tests).

    Returns:
        (B, T, H, D) in q.dtype.
    """
    b, t, h, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if hkv != h:
        assert h % hkv == 0
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)

    # Precision rides the global default: tests pin
    # jax_default_matmul_precision=highest for the fp32 oracle; the bf16
    # production path keeps the fast MXU mode.
    logits = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    if spec is not None:
        ok = allowed_mask(spec, t, s, kv_valid, q_offset)[:, None]
    elif causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (b, t, s), 1)
        q_pos = q_pos + jnp.broadcast_to(
            jnp.asarray(q_offset, jnp.int32), (b,)
        )[:, None, None]
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, t, s), 2)
        ok = (k_pos <= q_pos)
        if kv_valid is not None:
            ok = ok & (kv_valid[:, None, :] != 0)
        ok = ok[:, None]
    else:
        ok = jnp.ones((b, 1, t, s), dtype=bool)
        if kv_valid is not None:
            ok = ok & (kv_valid[:, None, None, :] != 0)

    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(ok, logits, neg)
    # Rows with no valid key (fully padded queries) would softmax over all
    # -inf; make them output zeros instead of NaN.
    row_any = jnp.any(ok, axis=-1, keepdims=True)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(row_any, probs, 0.0)
    out = jnp.einsum(
        "bhts,bshd->bthd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "use_flash", "block_q", "block_kv"),
)
def mma_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    causal: bool = True,
    scale: float | None = None,
    use_flash: bool | None = None,
    block_q: int = 1024,
    block_kv: int = 1024,
) -> jax.Array:
    """MMA attention — Pallas flash kernel on TPU, dense oracle elsewhere."""
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    if use_flash:
        from .flash_mma import flash_mma_attention

        return flash_mma_attention(
            q, k, v, spec=spec, kv_valid=kv_valid, q_offset=q_offset,
            causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        )
    return dense_attention(
        q, k, v, spec=spec, kv_valid=kv_valid, q_offset=q_offset,
        causal=causal, scale=scale,
    )


def decoder_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    causal: bool = True,
    scale: float | None = None,
) -> jax.Array:
    """Causal|MMA prefill attention as plain XLA einsums with bf16
    probabilities — the decoder serving fast path on v5e.

    Replays the vision-tower result (``encoder_attention_xla``) at decoder
    prefill shapes: the Pallas flash kernel is capped by the ~175-245 GB/s
    Pallas DMA ceiling while XLA streams the materialized bf16 probability
    tensor at ~450 GB/s.  Measured in-jit at T=656, H=32, D=96
    (exp/prefill_attn_ab.py): bs48 7.35 vs flash 12.52 ms/layer, bs16
    2.55 vs 4.47, bs1 0.79 vs 0.91; maxerr 7.8e-3 (bf16 probability
    rounding — inside the W8A8 path's quantization noise, which is why
    this is gated to quantized serving; training keeps the flash kernel's
    O(1)-residual vjp).

    The mask is the same 3-scalar MMA contract as the kernel
    (``allowed_mask``) — iota compares that fuse into the score fusion,
    never a host-built dense mask.  Fully-masked query rows (left-padding)
    return zeros like ``dense_attention``.

    q: (B, T, H, D); k/v: (B, S, Hkv, D) with Hkv | H.  Extra zero lanes
    from the padded-head layout are harmless (zeros contribute nothing to
    either dot) — pass the real head_dim's ``scale``.
    """
    b, t, h, d = q.shape
    s_len, hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if hkv != h:
        assert h % hkv == 0
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)

    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    if spec is not None:
        ok = allowed_mask(spec, t, s_len, kv_valid, q_offset)[:, None]
    else:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (b, 1, t, s_len), 2)
        q_pos = q_pos + jnp.broadcast_to(
            jnp.asarray(q_offset, jnp.int32), (b,))[:, None, None, None]
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, 1, t, s_len), 3)
        ok = (k_pos <= q_pos) if causal else jnp.ones_like(k_pos, bool)
        if kv_valid is not None:
            ok = ok & (kv_valid[:, None, None, :] != 0)

    s = jnp.where(ok, s, -1e30)
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bthd", p, v,
                   preferred_element_type=jnp.float32)
    o = o / l.transpose(0, 2, 1, 3)
    # fully-masked rows (left padding): m == -1e30 makes every p == 1;
    # zero them like dense_attention does
    row_any = jnp.any(ok, axis=-1).transpose(0, 2, 1)[..., None]
    return jnp.where(row_any, o, 0.0).astype(q.dtype)


def encoder_attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                          scale: float | None = None) -> jax.Array:
    """Full (non-causal, unmasked) attention as plain XLA einsums with
    bf16 probabilities — the vision-tower fast path on v5e.

    At SigLIP shapes (729 tok, 16 heads, d=72) the Pallas flash kernel is
    DMA-bound at the ~175-245 GB/s Pallas pipeline ceiling (1.35 ms/call
    in-scan) while XLA streams the materialized bf16 score/probability
    tensors at ~2x that rate: measured 1.03 ms/call, maxerr 4e-3 vs the
    kernel (bf16 probability rounding — inside the int8 tower's existing
    quantization noise). The decoder keeps the flash kernel: at 32 heads
    and causal+MMA masking the dense form measured 4.98 vs flash 2.42.

    q/k/v: (B, T, H, D) -> (B, T, H, D).
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bthd", p, v,
                   preferred_element_type=jnp.float32)
    return (o / l.transpose(0, 2, 1, 3)).astype(q.dtype)
