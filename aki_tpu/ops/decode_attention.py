"""Pallas TPU decode attention over an int8 KV cache (flat layout).

Decode is HBM-bandwidth bound: each step reads the whole live cache.  For
AKI-4B (Phi-3-mini is MHA — 32 KV heads x 96 dims — ~196 KB/token int8),
the cache read rivals the weight read per step.

Design (each point is a measured cliff, not a guess):

- **Flat cache layout** ``(L, B, S, Hkv*D)`` int8 — all heads of a token
  are one contiguous row (no lane padding: D=96 keeps the rows 24x128
  lanes).  Both attention matmuls become ONE 2D MXU dot per KV block:
  ``scores = Qbig @ K_flat^T`` with ``Qbig`` (H, Hkv*D) *block-diagonal*
  (built in XLA from the per-head q vectors), and ``out_full = P8 @
  V_flat`` followed by a masked selector dot that collapses the diagonal
  blocks.  Per-head dots are M=1 matvecs whose fixed per-dot cost
  dominates (~600 cycles x 2H dots = 40 us/cell -> 13% of HBM bandwidth),
  and Mosaic cannot lower batched dot_general — the block-diagonal trick
  is how all heads share two MXU ops.  The HxFLOP waste is irrelevant:
  the MXU is ~100x faster than the bytes feeding it.
- **int8 x int8 dots**: Qbig is quantized per head in XLA; P is
  requantized per row in-kernel — the MXU runs its native int8 path
  (measured 192 vs 120 TFLOP/s bf16 on v5e) and the kernel never
  converts the cache to float.
- **Selector-dot extraction**: collapsing out_full (H, F) to (H, D) with
  per-head static lane slices costs ~5 us/cell in tiny VPU ops; one
  ``(H, F) @ Sel (F, D)`` dot against a constant 0/1 matrix (cached in
  VMEM by its constant index_map) does it in ~0.2 us.
- **Zero-copy cache reads**: the stacked (L, ...) buffers are kernel
  operands; the BlockSpec index_map picks ``[layer, b, kv_block]`` via
  scalar prefetch.  A wrapper-level ``dynamic_slice``/pad/transpose
  materializes cache-sized HBM copies every layer of every step
  (measured 11.9 -> 7.0 img/s end to end).
- Validity comes from scalar-prefetched ``lengths`` alone (decode caches
  are contiguous-prefix valid by construction), which both drops an
  operand stream and skips KV blocks past the live region.
- Per-(token, head) dequant scales fold in as per-layer ``(B, H, S)``
  f32 arrays (``q.(k8*s) == (q.k8)*s``; V scales fold into the
  probability rows before requantization).  FA2 online softmax across
  blocks.
- **Token-major scale storage** ``(L, B, S, Hkv)``: decode writes one
  token's scales as a contiguous row, exactly like the int8 rows. The
  head-major ``(L, B, Hkv, S)`` layout made the per-step scale scatter
  a strided column write that XLA could not keep in place — measured
  ~3 ms/step of copy traffic at AKI-4B. Readers transpose the tiny
  per-layer slice instead (~1.5 MB, fuses).

Requires the cache length S to be a multiple of 128 (or a single block):
the engine rounds ``max_len`` accordingly.

Replaces the reference's per-step HF SDPA over torch KV tuples
(``src/aki_generation.py:36-85`` + HF cache) with a single fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


N_BUFFERS = 3  # DMA slots in flight (2 would halve achievable bandwidth)


def _kernel(
    # scalar prefetch
    layer_ref,              # (1,) layer index into the stacked cache
    lengths_ref,            # (B,) live token count per sample
    # inputs
    qb_ref,                 # (1, H, F) int8 block-diagonal Q (VMEM)
    k_hbm,                  # (L, B, S, F) int8 — stays in HBM
    v_hbm,
    ks_ref,                 # (1, H, S) f32 effective K scales (VMEM)
    vs_ref,                 # (1, H, S) f32 effective V scales
    sel_ref,                # (F, D) f32 constant selector (c % D == dd)
    # outputs
    o_ref,                  # (1, H, D) f32
    # scratch
    m_scr, l_scr, acc_scr,  # (H, 128), (H, 128), (H, D) f32
    k_buf, v_buf,           # (N_BUFFERS, block_kv, F) int8
    sems,                   # DMA semaphores (N_BUFFERS, 2)
    *,
    scale: float,
    block_kv: int,
    heads: int,
    kv_heads: int,
    head_dim: int,
):
    b = pl.program_id(0)
    li = layer_ref[0]
    length = lengths_ref[b]
    group = heads // kv_heads
    f = kv_heads * head_dim

    # one grid cell per batch element; the KV-block loop is manual so
    # several HBM->VMEM DMAs stay in flight at once. (A dedicated DMA
    # harness, exp/dma_rate.py, later measured single-stream Pallas
    # HBM->VMEM saturating at ~175-200 GB/s regardless of auto vs manual
    # pipelining or slot count — the XLA decode path at ~327 GB/s is why
    # decode_attention_flat_xla is the default; this kernel remains the
    # DECODE_IMPL="pallas" option.)
    n_live = (length + block_kv - 1) // block_kv

    def k_dma(j, slot):
        return pltpu.make_async_copy(
            k_hbm.at[li, b, pl.ds(j * block_kv, block_kv), :],
            k_buf.at[slot], sems.at[slot, 0],
        )

    def v_dma(j, slot):
        return pltpu.make_async_copy(
            v_hbm.at[li, b, pl.ds(j * block_kv, block_kv), :],
            v_buf.at[slot], sems.at[slot, 1],
        )

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    n_total = k_hbm.shape[2] // block_kv  # static block count

    # prologue: fill the pipeline (static bound check: slices must be
    # in-bounds even when predicated off)
    for s in range(N_BUFFERS - 1):
        if s < n_total:
            @pl.when(s < n_live)
            def _(s=s):
                k_dma(s, s).start()
                v_dma(s, s).start()

    def body(j, _):
        slot = j % N_BUFFERS
        ahead = j + N_BUFFERS - 1
        # clamp the prefetch index so the slice stays in bounds; the
        # pl.when gate controls whether the DMA actually issues
        ja = jnp.minimum(ahead, n_total - 1)

        @pl.when(ahead < n_live)
        def _():
            k_dma(ja, ja % N_BUFFERS).start()
            v_dma(ja, ja % N_BUFFERS).start()

        k_dma(j, slot).wait()
        v_dma(j, slot).wait()

        qb = qb_ref[0]                                # (H, F) int8
        k = k_buf[slot]                               # (block_kv, F) int8
        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(jnp.float32)                         # (H, block_kv)
        k_start = j * block_kv
        # effective scale = q_scale[h] * k_scale[token] (folded in XLA)
        s = s * ks_ref[0, :, pl.ds(k_start, block_kv)] * scale

        # contiguous-prefix validity: slot t live iff k_start + t < length
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
        ok = (k_start + col) < length
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(ok, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)

        # fold V dequant scales, requantize the probability rows to int8
        pv = p * vs_ref[0, :, pl.ds(k_start, block_kv)]
        pmax = jnp.max(jnp.abs(pv), axis=-1, keepdims=True)
        pscale = jnp.where(pmax == 0.0, 1.0, pmax / 127.0)
        p8 = jnp.round(pv / pscale).astype(jnp.int8)

        v = v_buf[slot]                               # (block_kv, F) int8
        o_full = jax.lax.dot_general(
            p8, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(jnp.float32)                         # (H, F)

        # mask to each head's diagonal block, then collapse (H, F) ->
        # (H, D) with one selector dot (per-head lane slices are ~25x
        # slower: 2H tiny sublane ops)
        row = jax.lax.broadcasted_iota(jnp.int32, (heads, f), 0)
        colf = jax.lax.broadcasted_iota(jnp.int32, (heads, f), 1)
        o_masked = jnp.where((colf // head_dim) == (row // group),
                             o_full, 0.0)
        o_diag = jax.lax.dot_general(
            o_masked, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                             # (H, D)

        acc_scr[:] = acc_scr[:] * alpha + o_diag * pscale
        # scalar-column writes only — broadcasting (1,1) across both
        # sublanes and lanes is not implemented in Mosaic
        m_scr[:, :1] = m_new
        l_scr[:, :1] = l_new
        return 0

    jax.lax.fori_loop(0, n_live, body, 0)

    l = l_scr[:, :1]
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def pick_block_kv(s_len: int, target: int = 256) -> int:
    """Largest multiple of 128 dividing s_len and <= target; falls back to
    a single whole-sequence block (legal: block dim == array dim)."""
    best = 0
    for cand in range(128, min(target, s_len) + 1, 128):
        if s_len % cand == 0:
            best = cand
    return best or s_len


def build_qblock(q: jax.Array, kv_heads: int) -> tuple[jax.Array, jax.Array]:
    """(B, 1, H, D) q -> block-diagonal int8 (B, H, Hkv*D) + (B, H) scales.

    Row h carries q[h] in column block h // group, zeros elsewhere — so
    ``Qbig @ K_flat^T`` computes exactly the per-head scores in one dot.
    """
    b, _, h, d = q.shape
    group = h // kv_heads
    q32 = q.reshape(b, h, d).astype(jnp.float32)
    amax = jnp.max(jnp.abs(q32), axis=-1)                  # (B, H)
    qscale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q8 = jnp.clip(jnp.round(q32 / qscale[..., None]), -127, 127)
    sel = np.zeros((h, kv_heads), np.float32)
    sel[np.arange(h), np.arange(h) // group] = 1.0
    qbig = q8[:, :, None, :] * jnp.asarray(sel)[None, :, :, None]
    return (
        qbig.reshape(b, h, kv_heads * d).astype(jnp.int8),
        qscale.astype(jnp.float32),
    )


@functools.lru_cache(maxsize=8)
def _selector(kv_heads: int, head_dim: int) -> np.ndarray:
    """(F, D) 0/1 matrix with Sel[c, dd] = (c % D == dd)."""
    f = kv_heads * head_dim
    sel = np.zeros((f, head_dim), np.float32)
    sel[np.arange(f), np.arange(f) % head_dim] = 1.0
    return sel


def decode_attention_flat(
    q: jax.Array,           # (B, 1, H, D)
    k: jax.Array,           # (L, B, S, Hkv*D) int8 flat cache
    ks: jax.Array,          # (L, B, S, Hkv) f32 per-(token, head) K scales
    v: jax.Array,
    vs: jax.Array,
    lengths: jax.Array,     # (B,) live tokens incl. the just-written one
    layer: jax.Array,       # scalar layer index
    scale: float | None = None,
    block_kv: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-token attention over one layer of the flat int8 cache.
    Returns (B, 1, H, D)."""
    b, _, h, d = q.shape
    s_len, hkv = ks.shape[2], ks.shape[3]
    assert h % hkv == 0 and k.shape[-1] == hkv * d
    group = h // hkv
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_kv = pick_block_kv(s_len, block_kv)
    qb, qscale = build_qblock(q, hkv)

    # per-layer effective scales, (B, H, S) f32 (~1.5 MB at bs16 — cheap):
    # ks_eff[b, h, s] = qscale[b, h] * ks[li, b, s, h // g]
    ks_li = jax.lax.dynamic_index_in_dim(
        ks, layer, 0, keepdims=False).transpose(0, 2, 1)
    vs_li = jax.lax.dynamic_index_in_dim(
        vs, layer, 0, keepdims=False).transpose(0, 2, 1)
    if group > 1:
        ks_li = jnp.repeat(ks_li, group, axis=1)
        vs_li = jnp.repeat(vs_li, group, axis=1)
    ks_eff = ks_li * qscale[:, :, None]
    vs_eff = vs_li

    sel = jnp.asarray(_selector(hkv, d))
    layer1 = jnp.asarray(layer, jnp.int32).reshape(1)

    f = hkv * d

    kernel = functools.partial(
        _kernel, scale=float(scale), block_kv=block_kv, heads=h,
        kv_heads=hkv, head_dim=d,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, h, f),
                    lambda bb, li, _: (bb, 0, 0),
                ),
                # the cache stays in HBM; the kernel DMAs blocks itself
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (1, h, s_len),
                    lambda bb, li, _: (bb, 0, 0),
                ),
                pl.BlockSpec(
                    (1, h, s_len),
                    lambda bb, li, _: (bb, 0, 0),
                ),
                # constant index map -> fetched once, stays resident
                pl.BlockSpec(
                    (f, d),
                    lambda bb, li, _: (0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, h, d),
                lambda bb, li, _: (bb, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((h, 128), jnp.float32),
                pltpu.VMEM((h, 128), jnp.float32),
                pltpu.VMEM((h, d), jnp.float32),
                pltpu.VMEM((N_BUFFERS, block_kv, f), jnp.int8),
                pltpu.VMEM((N_BUFFERS, block_kv, f), jnp.int8),
                pltpu.SemaphoreType.DMA((N_BUFFERS, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(layer1, lengths.astype(jnp.int32), qb, k, v, ks_eff, vs_eff, sel)

    return out[:, None].astype(q.dtype)  # (B, 1, H, D)


# Which int8-decode implementation the model uses. Measured on v5e (bs16,
# 768-slot cache): "xla" streams the int8 cache through bf16 dot_generals
# with the int8->bf16 convert fused into the operand read; "pallas" (the
# fused kernel above) is capped by the ~260 GB/s Pallas DMA ceiling of
# this stack and only reaches bf16 parity.
DECODE_IMPL = "xla"


def decode_attention_flat_xla(
    q: jax.Array,           # (B, 1, H, D)
    k: jax.Array,           # (L, B, S, Hkv*D) int8 flat cache
    ks: jax.Array,          # (L, B, S, Hkv) f32 per-(token, head) K scales
    v: jax.Array,
    vs: jax.Array,
    lengths: jax.Array,     # (B,) live tokens incl. the just-written one
    layer: jax.Array,       # scalar layer index
    scale: float | None = None,
    live_width: int | None = None,
) -> jax.Array:
    """XLA-native single-token attention over one layer of the int8 cache.

    Same contract (and the same block-diagonal math) as
    :func:`decode_attention_flat`, but expressed in XLA: the flat (B, S, F)
    layer slice is consumed DIRECTLY by ``dot_general``s against a
    block-diagonal Q — never reshaped to (B, S, Hkv, D), which would
    physically relayout the whole cache every layer (D=96 is not a lane
    multiple; measured ~7 ms/layer of relayout). The wasted off-diagonal
    MXU FLOPs are trivial (~0.4 ms/step for AKI-4B) while the int8 bytes
    stream at XLA bandwidth instead of the Pallas DMA ceiling.

    The dots run in **bf16 with the int8 operand converted inline**: a
    batched int8 x int8 ``dot_general`` lowers to a dilated convolution on
    TPU that materializes the 37 MB layer slice to HBM first (measured
    ~6 ms/step of extra traffic at AKI-4B inside the decode scan), while
    the bf16 lowering fuses the dynamic-slice + convert into the operand
    read. Decode is memory-bound, so bf16-vs-int8 MXU rate is irrelevant —
    and skipping the q/probability requantization removes two of the three
    quantization error sources (only the cache itself stays int8).
    Scales fold outside the contractions: K scales multiply the score
    matrix elementwise; V scales fold into the probability rows.
    """
    b_full, _, h, d = q.shape
    s_len, hkv = ks.shape[2], ks.shape[3]
    assert h % hkv == 0 and k.shape[-1] == hkv * d
    group = h // hkv
    f = hkv * d
    if scale is None:
        scale = d ** -0.5
    # live_width: only the first ``live_width`` batch rows are live (the
    # serving engine's tail compaction moves active slots to the front).
    # A static batch-PREFIX slice of the (B, S, F) layer read fuses into
    # the contraction — decode streams live_width/B of the cache bytes —
    # with no narrow cache copy ever materialized. Dead rows come back
    # zero-padded so the caller's shapes are unchanged.
    b = b_full if live_width is None else min(live_width, b_full)
    if b != b_full:
        q = q[:b]
        lengths = lengths[:b]

    # block-diagonal bf16 Q: row h carries q[h] in column block h // group
    sel_h = np.zeros((h, hkv), np.float32)
    sel_h[np.arange(h), np.arange(h) // group] = 1.0
    qb = (
        q.reshape(b, h, d).astype(jnp.float32)[:, :, None, :]
        * jnp.asarray(sel_h)[None, :, :, None]
    ).reshape(b, h, f).astype(jnp.bfloat16)

    k_li = jax.lax.dynamic_index_in_dim(k, layer, 0, keepdims=False)[:b]
    v_li = jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)[:b]
    # token-major (B, S, Hkv) scale slices -> (B, Hkv, S) for the
    # elementwise folds (a ~1.5 MB transpose per layer; the token-major
    # storage keeps the per-step scale WRITE a contiguous row scatter)
    ks_li = jax.lax.dynamic_index_in_dim(
        ks, layer, 0, keepdims=False)[:b].transpose(0, 2, 1)
    vs_li = jax.lax.dynamic_index_in_dim(
        vs, layer, 0, keepdims=False)[:b].transpose(0, 2, 1)
    if group > 1:
        ks_li = jnp.repeat(ks_li, group, axis=1)
        vs_li = jnp.repeat(vs_li, group, axis=1)

    s32 = jnp.einsum(
        "bhf,bsf->bhs", qb, k_li.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )
    s = s32 * ks_li * scale

    col = jax.lax.broadcasted_iota(jnp.int32, (b, 1, s_len), 2)
    ok = col < lengths.astype(jnp.int32)[:, None, None]
    s = jnp.where(ok, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)          # (B, H, S)

    pv = (p * vs_li).astype(jnp.bfloat16)
    o_full = jnp.einsum(
        "bhs,bsf->bhf", pv, v_li.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )                                       # (B, H, F) — off-diag garbage

    row = jax.lax.broadcasted_iota(jnp.int32, (h, f), 0)
    colf = jax.lax.broadcasted_iota(jnp.int32, (h, f), 1)
    o_masked = jnp.where(
        ((colf // d) == (row // group))[None], o_full, 0.0
    )
    sel = jnp.asarray(_selector(hkv, d))    # (F, D)
    o = jnp.einsum("bhf,fd->bhd", o_masked, sel)
    o = o.reshape(b, 1, h, d).astype(q.dtype)
    if b != b_full:
        o = jnp.pad(o, ((0, b_full - b), (0, 0), (0, 0), (0, 0)))
    return o


def quantize_kv_flat(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8 over the head dim, flat layout.

    x: (B, T, H, D) -> (int8 (B, T, H*D), scales (B, T, H) f32).
    """
    b, t, h, d = x.shape
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(b, t, h * d), scale
