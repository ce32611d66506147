"""Pallas TPU flash attention with the modality-mutual (MMA) block mask.

This is the TPU-native replacement for the reference's dense 4D mask + SDPA
(``src/vlm.py:410-443``): the mask never exists in HBM.  Each (block_q,
block_kv) tile evaluates the predicate

    allowed = valid_k & ( k <= q  |  (img_start <= q < txt_start
                                      & txt_start <= k < txt_end) )

from three per-sample scalars (scalar-prefetched to SMEM), unioned over
images for the multi-image case.  One kernel therefore serves the causal /
DOT / MMA ablations (``BASELINE.json`` config #3) — causal is an empty
block.

Implementation: flash-attention-2 style online softmax.  Grid is
``(B, H, num_q_blocks, num_kv_blocks)`` with the KV dimension innermost;
running max / sum / accumulator live in VMEM scratch that persists across
the sequential KV iterations.  KV tiles with no interaction for the current
Q tile (beyond the causal frontier and outside the MMA block) are skipped
with ``pl.when`` — the same block-sparsity the causal skip gives standard
flash kernels, extended with the MMA rectangle.

Backward: ``jax.custom_vjp`` dispatching on ``BACKWARD_IMPL`` (below, next
to ``_flash_fwd``).  The default is the Pallas flash backward
(``flash_mma_bwd.run_backward`` — no (T,S) matrices ever hit HBM, O(1)
residuals beyond q/k/v/out); ``"dense"`` keeps the rematerialized dense
oracle (exact same masked-softmax math, O(T^2) logits) for tests and
debugging.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masks import MMASpec

NEG_INF = -1e30

# Softmax in base 2: exp2 is the cheap hardware path on the VPU (one
# transcendental vs exp's range-reduction chain) and the kernel is
# VPU-bound at AKI tile sizes. log2(e) folds into the softmax scale the
# wrapper already bakes into q, so p = exp2(s2 - m2) == exp(s - m)
# exactly in real arithmetic. NEG_INF is base-agnostic (exp2(-1e30) == 0).
EXP2 = True
_LOG2E = 1.4426950408889634


def _exp_fn(x):
    return jnp.exp2(x) if EXP2 else jnp.exp(x)


def _mask_ok(img_start_ref, txt_start_ref, txt_end_ref, kv_valid_ref,
             b, q_start, k_start, block_q, block_kv, num_images, causal):
    """The MMA mask predicate for one (q_block, kv_block) tile — the
    semantic core of the kernel, shared by both variants. Depends only on
    positions, so multi-head cells build it once per cell."""
    q_pos = q_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 0
    )
    k_pos = k_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 1
    )
    ok = (k_pos <= q_pos) if causal else (k_pos == k_pos)
    for n in range(num_images):
        i0 = img_start_ref[b, n]
        t0 = txt_start_ref[b, n]
        t1 = txt_end_ref[b, n]
        ok = ok | (
            (q_pos >= i0) & (q_pos < t0) & (k_pos >= t0) & (k_pos < t1)
        )
    return ok & (kv_valid_ref[0] != 0)  # (1, block_kv) broadcasts over rows


def _kernel(
    # scalar prefetch (SMEM)
    img_start_ref, txt_start_ref, txt_end_ref, q_offset_ref,
    # inputs (VMEM tiles)
    q_ref, k_ref, v_ref, kv_valid_ref,
    # output
    o_ref,
    # scratch
    m_scr, l_scr, acc_scr,
    *,
    block_q: int,
    block_kv: int,
    block_h: int,
    num_images: int,
    causal: bool,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)

    q_offset = q_offset_ref[b]
    q_start = qi * block_q + q_offset      # absolute position of q row 0
    k_start = kj * block_kv

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # --- block-level relevance -------------------------------------------
    # causal: the tile has any k <= q iff k_start <= q_last; non-causal
    # (encoder) mode keeps every tile
    causal_overlap = (
        k_start <= q_start + (block_q - 1) if causal else True
    )
    # MMA rectangles: q rows in [img_start, txt_start), k cols in
    # [txt_start, txt_end) — overlap test per image, then OR.
    mma_overlap = False
    for n in range(num_images):
        i0 = img_start_ref[b, n]
        t0 = txt_start_ref[b, n]
        t1 = txt_end_ref[b, n]
        q_ov = (q_start < t0) & (q_start + block_q > i0)
        k_ov = (k_start < t1) & (k_start + block_kv > t0)
        mma_overlap = mma_overlap | (q_ov & k_ov)

    @pl.when(causal_overlap | mma_overlap)
    def _compute():
        # Build the mask ONCE per cell and share it across the block_h
        # heads processed here (this VPU work rivals the MXU dots at AKI
        # tile sizes; amortizing it is the point of multi-head cells).
        ok = _mask_ok(
            img_start_ref, txt_start_ref, txt_end_ref, kv_valid_ref,
            b, q_start, k_start, block_q, block_kv, num_images, causal,
        )
        neg = jnp.where(ok, 0.0, NEG_INF)  # additive mask, reused per head

        for g in range(block_h):           # unrolled: static 2D dots (Mosaic
            q = q_ref[0, g]                # has no batched dot_general)
            k = k_ref[0, g]
            v = v_ref[0, g]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
            ) + neg                        # (block_q, block_kv); scale is
                                           # pre-folded into q by the wrapper

            m_prev = m_scr[g][:, :1]                  # (block_q, 1)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = _exp_fn(s - m_new)
            # fully-masked rows: m_new == NEG_INF -> exp(0) == 1 garbage
            p = jnp.where(ok, p, 0.0)
            alpha = _exp_fn(m_prev - m_new)
            l_new = l_scr[g][:, :1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True
            )
            acc_scr[g] = acc_scr[g] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
            )
            m_scr[g] = jnp.broadcast_to(m_new, m_scr.shape[1:])
            l_scr[g] = jnp.broadcast_to(l_new, l_scr.shape[1:])

    @pl.when(kj == nk - 1)
    def _finalize():
        for g in range(block_h):
            l = l_scr[g][:, :1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, g] = (acc_scr[g] / l).astype(o_ref.dtype)


def _kernel_1kv(
    # scalar prefetch (SMEM)
    img_start_ref, txt_start_ref, txt_end_ref, q_offset_ref,
    # inputs (VMEM tiles)
    q_ref, k_ref, v_ref, kv_valid_ref,
    # output
    o_ref,
    *,
    block_q: int,
    block_kv: int,
    block_h: int,
    num_images: int,
    causal: bool,
    plain: bool = False,
):
    """Single-KV-tile specialization: the whole softmax happens in one cell,
    so the online-softmax scratch (m/l/acc across kj) is dead weight — this
    variant needs none, which is what lets block_h > 2 fit scoped VMEM.
    AKI sequences (~0.7k spliced) always take this path.

    The mask enters as a per-cell additive ``neg`` tile shared by all
    block_h heads — measured on v5e, per-head ``where`` selects over the
    (block_q, block_kv) scores rival the MXU dots (this kernel is
    VPU-bound at AKI tile sizes). ``plain=True`` (full attention: encoder
    with no padding) skips mask work entirely — 2.4x faster measured."""
    b = pl.program_id(0)
    qi = pl.program_id(2)

    if plain:
        neg = None
    else:
        q_offset = q_offset_ref[b]
        q_start = qi * block_q + q_offset
        ok = _mask_ok(
            img_start_ref, txt_start_ref, txt_end_ref, kv_valid_ref,
            b, q_start, 0, block_q, block_kv, num_images, causal,
        )
        neg = jnp.where(ok, 0.0, NEG_INF)   # built once, added per head

    for g in range(block_h):
        q = q_ref[0, g]          # scale pre-folded into q by the wrapper
        k = k_ref[0, g]
        v = v_ref[0, g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        if neg is not None:
            s = s + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        # masked entries: exp(NEG_INF - m) == 0 exactly, no second where
        # pass needed. Fully-masked ROWS (m stuck at NEG_INF -> p == 1
        # garbage) DO occur for real rows — left-padded samples, empty
        # kv_valid — so zero them via the row max, matching the dense
        # oracle (one (block_q, 1) compare, not a (bq, bkv) pass).
        p = _exp_fn(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        if plain:
            o_ref[0, g] = (acc / l).astype(o_ref.dtype)
        else:
            l = jnp.where(l == 0.0, 1.0, l)
            live = m > NEG_INF * 0.5          # (block_q, 1)
            o_ref[0, g] = jnp.where(live, acc / l, 0.0).astype(o_ref.dtype)


def _kernel_1kv_flat(
    # scalar prefetch (SMEM)
    img_start_ref, txt_start_ref, txt_end_ref, q_offset_ref,
    # inputs (VMEM tiles): flat (1, rows, block_h*dp)
    q_ref, k_ref, v_ref, kv_valid_ref,
    # output
    o_ref,
    *,
    block_q: int,
    block_kv: int,
    block_h: int,
    dp: int,
    num_images: int,
    causal: bool,
):
    """Single-KV-tile kernel over FLAT padded-head operands: each head
    occupies ``dp`` (128-multiple) lanes of the last dim, so per-head
    q/k/v are 128-ALIGNED lane slices of one (rows, block_h*dp) tile —
    the (B,T,H,D)->(B,H,T,Dp) pad+transpose relayouts around the standard
    kernel (measured ~3 ms/layer at AKI-4B prefill) do not exist.
    Zero pad lanes contribute zero to the QK dot; V pad lanes come out
    zero and the consumer (zero-padded wo rows) ignores them."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q_offset = q_offset_ref[b]
    q_start = qi * block_q + q_offset
    ok = _mask_ok(
        img_start_ref, txt_start_ref, txt_end_ref, kv_valid_ref,
        b, q_start, 0, block_q, block_kv, num_images, causal,
    )
    neg = jnp.where(ok, 0.0, NEG_INF)

    for g in range(block_h):
        sl = slice(g * dp, (g + 1) * dp)
        q = q_ref[0][:, sl]          # (block_q, dp), lane-aligned
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        p = _exp_fn(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        l = jnp.where(l == 0.0, 1.0, l)
        live = m > NEG_INF * 0.5
        o_ref[0, :, sl] = jnp.where(live, acc / l, 0.0).astype(o_ref.dtype)


def flash_mma_attention_flat(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    head_dim: int,
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    causal: bool = True,
    scale: float | None = None,
    block_h: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """Flash MMA attention over the FLAT padded-head serving layout.

    Args:
        q/k/v: (B, T, H*DP) with DP = last_dim // num_heads a multiple of
            128 (``models/quant.py:pad_attention_heads``); real head dims
            sit in the low lanes of each DP block, pad lanes are zero.
        head_dim: the REAL head dim (softmax scale is head_dim**-0.5, not
            the padded width).
        Other args as :func:`flash_mma_attention`.

    Single-KV-tile only (AKI sequences); raises for T beyond one tile.
    Inference path — no custom_vjp (training uses the standard kernel).
    """
    b, t, f = q.shape
    dp = f // num_heads
    if dp * num_heads != f or dp % 128:
        raise ValueError(f"flat layout needs 128-multiple padded heads; "
                         f"got last dim {f} for {num_heads} heads")
    s_len = k.shape[1]
    s_pad = ((s_len + 127) // 128) * 128
    if s_pad > 1024 or t > 1024:
        raise ValueError("flat path is single-KV-tile; sequence too long")
    if scale is None:
        scale = head_dim ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img_start, txt_start, txt_end, n_img = _normalize_spec(spec, b)
    if kv_valid is None:
        kv_valid = jnp.ones((b, s_len), jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))

    qs = q * jnp.asarray(scale * (_LOG2E if EXP2 else 1.0), q.dtype)
    kt = _pad_to(k, s_pad, 1)
    vt = _pad_to(v, s_pad, 1)
    kv_valid_p = _pad_to(kv_valid.astype(jnp.int32), s_pad, 1)[:, None, :]

    # t as q-rows: bf16 sublane tiling wants multiples of 16
    t_pad = ((t + 15) // 16) * 16
    qs = _pad_to(qs, t_pad, 1)

    while num_heads % block_h:
        block_h //= 2
    grid = (b, num_heads // block_h, 1, 1)
    kernel = functools.partial(
        _kernel_1kv_flat,
        block_q=t_pad, block_kv=s_pad, block_h=block_h, dp=dp,
        num_images=n_img, causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, t_pad, block_h * dp),
                             lambda bb, hh, qi, kj, *_: (bb, 0, hh)),
                pl.BlockSpec((1, s_pad, block_h * dp),
                             lambda bb, hh, qi, kj, *_: (bb, 0, hh)),
                pl.BlockSpec((1, s_pad, block_h * dp),
                             lambda bb, hh, qi, kj, *_: (bb, 0, hh)),
                pl.BlockSpec((1, 1, s_pad),
                             lambda bb, hh, qi, kj, *_: (bb, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, t_pad, block_h * dp),
                                   lambda bb, hh, qi, kj, *_: (bb, 0, hh)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, f), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(img_start, txt_start, txt_end, q_offset.astype(jnp.int32),
      qs, kt, vt, kv_valid_p)
    return out[:, :t]


def _kernel_1kv_q8(
    # scalar prefetch (SMEM)
    img_start_ref, txt_start_ref, txt_end_ref, q_offset_ref,
    # inputs (VMEM tiles)
    q_ref, k_ref, v_ref,      # int8 (1, bh, bq|bkv, dp)
    sq_ref,                   # f32 (1, bh*bq, 1) — column layout per q row
    sk_ref, sv_ref,           # f32 (1, bh, bkv) — per-head lane vectors
    kv_valid_ref,
    # output
    o_ref,
    *,
    block_q: int,
    block_kv: int,
    block_h: int,
    num_images: int,
    causal: bool,
):
    """Single-KV-tile flash forward over int8 q/k/v (serving path).

    The kernel is DMA-bound on this stack (~260 GB/s Pallas ceiling;
    measured 1.65 ms/call bare at AKI prefill shapes) — int8 operands
    halve the bytes. Scores come off the native int8 MXU as int32 and
    rescale in f32 by per-(token, head) scales: sq rides as a (bq, 1)
    COLUMN block (lane dim 1 — natural column-broadcast layout), sk/sv as
    per-head lane vectors multiplying score/probability columns. V
    dequant folds into p (p * sv per column), so the PV dot runs bf16 x
    bf16 — no probability requantization (the accuracy trap the int8
    decode kernel measured).
    """
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q_offset = q_offset_ref[b]
    q_start = qi * block_q + q_offset
    ok = _mask_ok(
        img_start_ref, txt_start_ref, txt_end_ref, kv_valid_ref,
        b, q_start, 0, block_q, block_kv, num_images, causal,
    )
    neg = jnp.where(ok, 0.0, NEG_INF)
    sqs = sq_ref[0]                                   # (bh*bq, 1) f32

    for g in range(block_h):
        q = q_ref[0, g]                               # (bq, dp) int8
        k = k_ref[0, g]                               # (bkv, dp) int8
        s32 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )
        sqc = sqs[g * block_q:(g + 1) * block_q]      # (bq, 1)
        skr = sk_ref[0, g]                            # (bkv,) lanes
        s = s32.astype(jnp.float32) * sqc * skr + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        p = _exp_fn(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * sv_ref[0, g]).astype(jnp.bfloat16)  # fold V scales
        acc = jax.lax.dot_general(
            pv, v_ref[0, g].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        l = jnp.where(l == 0.0, 1.0, l)
        live = m > NEG_INF * 0.5
        o_ref[0, g] = jnp.where(live, acc / l, 0.0).astype(o_ref.dtype)


def _quantize_heads(x):
    """(B, T, H, D) -> (int8 same shape, f32 (B, T, H) per-row scales).
    Delegates to quantize_acts — the single source of the symmetric
    max-abs/127 rule shared with the int8 KV cache and the W8A8 matmuls."""
    from ..models.quant import quantize_acts

    q, scale = quantize_acts(x)
    return q, scale[..., 0]


def flash_mma_attention_q8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    causal: bool = True,
    scale: float | None = None,
    block_h: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """Flash MMA forward with int8 q/k/v (inference only, single KV tile).

    Quantizes q/k/v per (token, head) row — the same granularity as the
    int8 KV cache (``decode_attention.quantize_kv_flat``) — and runs the
    QK dot on the native int8 MXU; P stays bf16. Accuracy is the kv8
    class already accepted for decode. ~2x less kernel DMA than the bf16
    kernel (which is DMA-ceiling-bound). Sequences beyond one 1024 tile
    or GQA fall back to :func:`flash_mma_attention`.
    """
    b, t, h, d = q.shape
    s_len, hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_pad = max(128, ((t + 127) // 128) * 128)
    s_pad = max(128, ((s_len + 127) // 128) * 128)
    if hkv != h or t_pad > 1024 or s_pad > 1024:
        return flash_mma_attention(
            q, k, v, spec=spec, kv_valid=kv_valid, q_offset=q_offset,
            causal=causal, scale=scale, block_h=block_h,
            interpret=interpret,
        )
    d_pad = max(128, ((d + 127) // 128) * 128)
    img_start, txt_start, txt_end, n_img = _normalize_spec(spec, b)
    if kv_valid is None:
        kv_valid = jnp.ones((b, s_len), jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))

    while h % block_h:
        block_h //= 2

    q8, sq = _quantize_heads(q)
    k8, sk = _quantize_heads(k)
    v8, sv = _quantize_heads(v)

    def prep(x8):  # int8 (B, T', H, D) -> (B, H, T_pad', 128)
        size = t_pad if x8.shape[1] == t else s_pad
        return _pad_to(_pad_to(x8, size, 1), d_pad, 3).transpose(0, 2, 1, 3)

    qt, kt, vt = prep(q8), prep(k8), prep(v8)
    # fold softmax scale (and the exp2 log2e) into the q scales
    sq = sq * jnp.asarray(scale * (_LOG2E if EXP2 else 1.0), jnp.float32)
    # sq: (B, T, H) -> (B, H*T_pad, 1) column layout (pad rows zero-fill;
    # their outputs are dropped by the final [:, :t] slice)
    sq_c = _pad_to(sq.transpose(0, 2, 1), t_pad, 2).reshape(
        b, h * t_pad, 1)
    # sk/sv: (B, S, H) -> (B, H, S_pad) per-head lane vectors
    sk_r = _pad_to(sk.transpose(0, 2, 1), s_pad, 2)
    sv_r = _pad_to(sv.transpose(0, 2, 1), s_pad, 2)
    kv_valid_p = _pad_to(kv_valid.astype(jnp.int32), s_pad, 1)[:, None, :]

    grid = (b, h // block_h, 1, 1)
    kernel = functools.partial(
        _kernel_1kv_q8,
        block_q=t_pad, block_kv=s_pad, block_h=block_h,
        num_images=n_img, causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_h, t_pad, d_pad),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0)),
                pl.BlockSpec((1, block_h, s_pad, d_pad),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0)),
                pl.BlockSpec((1, block_h, s_pad, d_pad),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0)),
                pl.BlockSpec((1, block_h * t_pad, 1),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0)),
                pl.BlockSpec((1, block_h, s_pad),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0)),
                pl.BlockSpec((1, block_h, s_pad),
                             lambda bb, hh, qi, kj, *_: (bb, hh, 0)),
                pl.BlockSpec((1, 1, s_pad),
                             lambda bb, hh, qi, kj, *_: (bb, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_h, t_pad, d_pad),
                lambda bb, hh, qi, kj, *_: (bb, hh, 0, 0),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(img_start, txt_start, txt_end, q_offset.astype(jnp.int32),
      qt, kt, vt, sq_c, sk_r, sv_r, kv_valid_p)
    return out.transpose(0, 2, 1, 3)[:, :t, :, :d]


def _normalize_spec(spec, batch):
    if spec is None:
        z = jnp.zeros((batch, 1), jnp.int32)
        return z, z, z, 1
    spec = spec.with_batch_dim()
    return (
        spec.img_start.astype(jnp.int32),
        spec.txt_start.astype(jnp.int32),
        spec.txt_end.astype(jnp.int32),
        spec.img_start.shape[1],
    )


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11)
)
def _flash(q, k, v, packed_spec, kv_valid_and_offset,
           causal, scale, block_q, block_kv, block_h, interpret, plain):
    return _flash_fwd_impl(
        q, k, v, packed_spec, kv_valid_and_offset,
        causal, scale, block_q, block_kv, block_h, interpret, plain,
    )


def _flash_fwd_impl(q, k, v, packed_spec, kv_valid_and_offset,
                    causal, scale, block_q, block_kv, block_h, interpret,
                    plain=False):
    img_start, txt_start, txt_end = packed_spec
    kv_valid, q_offset = kv_valid_and_offset
    b, t, h, d = q.shape
    s_len, hkv = k.shape[1], k.shape[2]
    assert h % hkv == 0
    group = h // hkv
    n_img = img_start.shape[1]

    # Multi-head cells: block_h q-heads share one grid cell so the mask
    # predicate (pure VPU work, identical across heads) is built once.
    # GQA keeps block_h == 1 — heads in one cell would span several KV
    # heads and need distinct K/V tiles. Cap BEFORE the divisibility fix
    # (capping after could yield a block_h that no longer divides h,
    # silently dropping trailing heads).
    if group != 1:
        block_h = 1
    block_h = min(block_h, 16)  # >16 heads of tiles blow VMEM at 768-blocks
    while h % block_h:
        block_h //= 2

    # Pad head dim to the 128-lane boundary and seq lens to block multiples.
    d_pad = max(128, ((d + 127) // 128) * 128)
    block_q = min(block_q, max(128, ((t + 127) // 128) * 128))
    block_kv = min(block_kv, max(128, ((s_len + 127) // 128) * 128))
    t_pad = ((t + block_q - 1) // block_q) * block_q
    s_pad = ((s_len + block_kv - 1) // block_kv) * block_kv

    nq, nk = t_pad // block_q, s_pad // block_kv

    # full-attention fast path (encoder): no causal frontier, no MMA
    # rectangles, no kv_valid — the ONLY masking needed is the key rows the
    # wrapper itself pads in, and that is encoded into the dot: q gets 1.0
    # in its first pad lane and padded key rows get NEG_INF there, so
    # padded columns score -1e30 straight off the MXU and the kernel runs
    # a maskless softmax (the per-head (block_q, block_kv) select passes
    # were rivaling the dots — measured 2.4x on the SigLIP shapes).
    plain = plain and nk == 1 and d < d_pad

    # Fold the softmax scale into q here: one elementwise pass over
    # (B,T,H,D) instead of a per-cell pass over every (block_q, block_kv)
    # score tile inside the kernel.
    qs = q * jnp.asarray(scale * (_LOG2E if EXP2 else 1.0), q.dtype)
    if plain and s_len < s_pad:
        # padded key rows carry NEG_INF in the first pad lane and q
        # carries 1.0 there, so the pad mask rides the QK dot itself.
        # Built by CONCATENATION — a minor-dim .at[].set scatter relayouts
        # the whole tensor (measured +1.2 ms/layer on SigLIP shapes).
        one = jnp.ones_like(qs[..., :1])
        zq = jnp.zeros(qs.shape[:-1] + (d_pad - d - 1,), qs.dtype)
        qt = _pad_to(jnp.concatenate([qs, one, zq], -1), t_pad, 1)
        kp = _pad_to(k, s_pad, 1)
        kbias = jnp.concatenate(
            [jnp.zeros((b, s_len, hkv, 1), k.dtype),
             jnp.full((b, s_pad - s_len, hkv, 1), NEG_INF, k.dtype)], 1
        )
        zk = jnp.zeros(kp.shape[:-1] + (d_pad - d - 1,), k.dtype)
        kt = jnp.concatenate([kp, kbias, zk], -1)
    else:
        qt = _pad_to(_pad_to(qs, t_pad, 1), d_pad, 3)
        kt = _pad_to(_pad_to(k, s_pad, 1), d_pad, 3)
    vt = _pad_to(_pad_to(v, s_pad, 1), d_pad, 3).transpose(0, 2, 1, 3)
    qt = qt.transpose(0, 2, 1, 3)
    kt = kt.transpose(0, 2, 1, 3)
    # (B, 1, S): middle dim full so the (1, 1, block_kv) block tiles legally
    kv_valid_p = _pad_to(kv_valid.astype(jnp.int32), s_pad, 1)[:, None, :]
    if nk > 1 and block_h > 2:
        block_h = 2   # scoped-VMEM budget: online-softmax scratch scales
        while h % block_h:   # with block_h
            block_h //= 2
    grid = (b, h // block_h, nq, nk)

    kernel = functools.partial(
        _kernel_1kv if nk == 1 else _kernel,
        block_q=block_q, block_kv=block_kv,
        block_h=block_h, num_images=n_img, causal=causal,
        **({"plain": True} if plain else {}),
    )
    scratch = [] if nk == 1 else [
        pltpu.VMEM((block_h, block_q, 128), jnp.float32),
        pltpu.VMEM((block_h, block_q, 128), jnp.float32),
        pltpu.VMEM((block_h, block_q, d_pad), jnp.float32),
    ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_h, block_q, d_pad),
                    lambda bb, hh, qi, kj, *_: (bb, hh, qi, 0),
                ),
                pl.BlockSpec(
                    (1, block_h, block_kv, d_pad),
                    lambda bb, hh, qi, kj, *_, g=group: (
                        (bb, hh, kj, 0) if g == 1 else (bb, hh // g, kj, 0)
                    ),
                ),
                pl.BlockSpec(
                    (1, block_h, block_kv, d_pad),
                    lambda bb, hh, qi, kj, *_, g=group: (
                        (bb, hh, kj, 0) if g == 1 else (bb, hh // g, kj, 0)
                    ),
                ),
                pl.BlockSpec(
                    (1, 1, block_kv),
                    lambda bb, hh, qi, kj, *_: (bb, 0, kj),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_h, block_q, d_pad),
                lambda bb, hh, qi, kj, *_: (bb, hh, qi, 0),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # default scoped-VMEM budget is 16MB; multi-head tiles at
            # block_h=8 need ~25MB (v5e has 128MB VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(img_start, txt_start, txt_end, q_offset.astype(jnp.int32),
      qt, kt, vt, kv_valid_p)

    return out.transpose(0, 2, 1, 3)[:, :t, :, :d]


# Backward implementation: "flash" (Pallas kernels, no (T,S) matrices in
# HBM) or "dense" (rematerialized oracle — exact but O(T^2) memory).
BACKWARD_IMPL = "flash"


def _flash_fwd(q, k, v, packed_spec, kv_valid_and_offset,
               causal, scale, block_q, block_kv, block_h, interpret, plain):
    out = _flash_fwd_impl(
        q, k, v, packed_spec, kv_valid_and_offset,
        causal, scale, block_q, block_kv, block_h, interpret, plain,
    )
    return out, (q, k, v, out, packed_spec, kv_valid_and_offset)


def _flash_bwd(causal, scale, block_q, block_kv, block_h, interpret, plain,
               res, g):
    q, k, v, out, packed_spec, kv_valid_and_offset = res
    img_start, txt_start, txt_end = packed_spec
    kv_valid, q_offset = kv_valid_and_offset

    if BACKWARD_IMPL == "flash":
        from .flash_mma_bwd import run_backward

        dq, dk, dv = run_backward(
            q, k, v, out, g, img_start, txt_start, txt_end, kv_valid,
            q_offset, causal, scale, block_q, block_kv, interpret,
        )
        return dq, dk, dv, None, None

    from .attention import dense_attention

    # non-causal mode: a (normalized, empty) spec would force causal masking
    spec = (
        MMASpec(img_start=img_start, txt_start=txt_start, txt_end=txt_end)
        if causal else None
    )

    def f(q_, k_, v_):
        return dense_attention(
            q_, k_, v_, spec=spec, kv_valid=kv_valid, q_offset=q_offset,
            causal=causal, scale=scale,
        )

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def _shard_map():
    """shard_map with replication checking off, across jax versions."""
    import functools as _ft

    try:
        from jax import shard_map as _sm  # modern: check_vma kwarg

        return _ft.partial(_sm, check_vma=False)
    except ImportError:  # older jax: check_rep kwarg
        from jax.experimental.shard_map import shard_map as _sm

        return _ft.partial(_sm, check_rep=False)


def flash_mma_attention_sp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    axis: str = "seq",
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    **kw,
) -> jax.Array:
    """Sequence-parallel flash MMA attention: q/k/v shard along T over
    ``axis``; K/V are all-gathered inside the shard_map (one collective per
    layer) and each device runs the kernel on its local query rows with the
    absolute ``q_offset`` of its shard — the kernel's position arithmetic
    (causal frontier + MMA rectangles) is already offset-aware, so sequence
    parallelism composes with the MMA mask for free.

    The batch dimension keeps its (data, fsdp) sharding and heads keep
    their ``tensor`` sharding when those axes exist in ``mesh``, so SP
    composes with dp/fsdp/tp in one shard_map. Backward works through the
    ``custom_vjp``: the all-gather transposes to a reduce-scatter of dK/dV.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()
    names = set(mesh.shape)
    batch = tuple(a for a in ("data", "fsdp") if a in names) or None
    heads = "tensor" if "tensor" in names else None

    b, t, _, _ = q.shape
    n_seq = mesh.shape[axis]
    if t % n_seq:
        raise ValueError(
            f"sequence length {t} must divide the '{axis}' axis ({n_seq}); "
            f"pad the spliced sequence to a multiple (the data layer's "
            f"length buckets can guarantee this)"
        )
    img_start, txt_start, txt_end, _ = _normalize_spec(spec, b)
    if kv_valid is None:
        kv_valid = jnp.ones((b, k.shape[1]), jnp.int32)
    kv_valid = kv_valid.astype(jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))

    sharded = P(batch, axis, heads, None)
    rep = P(batch)

    def local(q_, k_, v_, i0, t0, t1, kvv, qo):
        t_local = q_.shape[1]
        k_full = jax.lax.all_gather(k_, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_, axis, axis=1, tiled=True)
        shard = jax.lax.axis_index(axis) * t_local
        return flash_mma_attention(
            q_, k_full, v_full,
            spec=MMASpec(img_start=i0, txt_start=t0, txt_end=t1),
            kv_valid=kvv, q_offset=qo + shard, **kw,
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, rep, rep, rep, rep, rep),
        out_specs=sharded,
    )(q, k, v, img_start, txt_start, txt_end, kv_valid, q_offset)


def flash_mma_attention_tp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    axis: str = "tensor",
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    **kw,
) -> jax.Array:
    """Tensor-parallel flash MMA attention: heads shard over ``axis``.

    Attention is embarrassingly parallel over heads, so the shard_map has
    ZERO collectives — each device runs the kernel on its head shard (the
    qkv projections already produce tensor-sharded heads under GSPMD, so
    the in_specs match the data's existing placement). A bare pallas_call
    under pjit would instead be replicated around (all-gather + redundant
    compute) because XLA cannot partition an opaque custom call.
    """
    shard_map = _shard_map()
    from jax.sharding import PartitionSpec as P

    b = q.shape[0]
    img_start, txt_start, txt_end, _ = _normalize_spec(spec, b)
    if kv_valid is None:
        kv_valid = jnp.ones((b, k.shape[1]), jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))

    heads = P(None, None, axis, None)
    rep = P()

    def local(q_, k_, v_, i0, t0, t1, kvv, qo):
        return flash_mma_attention(
            q_, k_, v_,
            spec=MMASpec(img_start=i0, txt_start=t0, txt_end=t1),
            kv_valid=kvv, q_offset=qo, **kw,
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(heads, heads, heads, rep, rep, rep, rep, rep),
        out_specs=heads,
    )(q, k, v, img_start, txt_start, txt_end, kv_valid, q_offset)


def flash_mma_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    causal: bool = True,
    scale: float | None = None,
    block_q: int = 1024,
    block_kv: int = 1024,
    block_h: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """Flash MMA attention. Shapes as :func:`aki_tpu.ops.attention.dense_attention`.

    Decode steps (q_len == 1) fall back to the dense path — a single-row
    softmax is bandwidth-bound either way and needs no tiling.
    """
    from .attention import dense_attention

    b, t, h, d = q.shape
    if t == 1:
        return dense_attention(
            q, k, v, spec=spec, kv_valid=kv_valid, q_offset=q_offset,
            causal=causal, scale=scale,
        )
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # full attention, nothing masked: eligible for the maskless fast path
    # (key-pad masking rides the dot via the q/k bias lane)
    plain = (not causal) and spec is None and kv_valid is None
    img_start, txt_start, txt_end, _ = _normalize_spec(spec, b)
    if kv_valid is None:
        kv_valid = jnp.ones((b, k.shape[1]), jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))
    return _flash(
        q, k, v, (img_start, txt_start, txt_end),
        (kv_valid.astype(jnp.int32), q_offset),
        causal, float(scale), int(block_q), int(block_kv), int(block_h),
        bool(interpret), plain,
    )
