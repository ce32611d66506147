"""Flash-attention backward kernels (MMA mask aware).

Completes the Pallas kernel story: the backward pass never materializes the
(T, S) probability matrix in HBM either.  Standard FA2 decomposition with
the MMA predicate reused from the forward:

    p    = exp(s * scale - lse)          per-row logsumexp from a stats pass
    dv   = p^T @ g
    dp   = g @ v^T
    ds   = p * (dp - delta) * scale      delta = rowsum(g * o)
    dq   = ds @ k
    dk   = ds^T @ q

Three kernels ride the same grid machinery as the forward:

- ``_lse_kernel``: forward-shaped pass that only produces per-row
  logsumexp (cheap: no V accumulation) — avoids changing the forward's
  output signature;
- ``_dq_kernel``: grid (B, H, nq, nk), accumulates dq per q tile;
- ``_dkv_kernel``: grid (B, H, nk, nq), accumulates dk/dv per kv tile.

GQA: dk/dv are computed per *query* head and group-summed outside (AKI's
decoder has no GQA, so this costs nothing in practice).

Row stats (lse, delta) are carried as (B, H, T, 128) lane-broadcast buffers
— the TPU-legal layout for per-row scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _tile_mask(q_start, k_start, block_q, block_kv, num_images, causal,
               img_start_ref, txt_start_ref, txt_end_ref, kv_valid_ref, b):
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
    k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
    ok = (k_pos <= q_pos) if causal else (k_pos == k_pos)
    for n in range(num_images):
        i0 = img_start_ref[b, n]
        t0 = txt_start_ref[b, n]
        t1 = txt_end_ref[b, n]
        ok = ok | ((q_pos >= i0) & (q_pos < t0) & (k_pos >= t0) & (k_pos < t1))
    return ok & (kv_valid_ref[0] != 0)


def _overlap(q_start, k_start, block_q, block_kv, num_images, causal,
             img_start_ref, txt_start_ref, txt_end_ref, b):
    causal_overlap = (k_start <= q_start + (block_q - 1)) if causal else True
    mma = False
    for n in range(num_images):
        i0 = img_start_ref[b, n]
        t0 = txt_start_ref[b, n]
        t1 = txt_end_ref[b, n]
        q_ov = (q_start < t0) & (q_start + block_q > i0)
        k_ov = (k_start < t1) & (k_start + block_kv > t0)
        mma = mma | (q_ov & k_ov)
    return causal_overlap | mma


def _lse_kernel(img_start_ref, txt_start_ref, txt_end_ref, q_offset_ref,
                q_ref, k_ref, kv_valid_ref, lse_ref, m_scr, l_scr,
                *, scale, block_q, block_kv, num_images, causal):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)
    q_start = qi * block_q + q_offset_ref[b]
    k_start = kj * block_kv

    @pl.when(kj == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    @pl.when(_overlap(q_start, k_start, block_q, block_kv, num_images, causal,
                      img_start_ref, txt_start_ref, txt_end_ref, b))
    def _():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        ok = _tile_mask(q_start, k_start, block_q, block_kv, num_images,
                        causal, img_start_ref, txt_start_ref, txt_end_ref,
                        kv_valid_ref, b)
        s = jnp.where(ok, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(ok, jnp.exp(s - m_new), 0.0)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * jnp.exp(m_prev - m_new)
            + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(kj == nk - 1)
    def _():
        l = jnp.where(l_scr[:] == 0.0, 1.0, l_scr[:])
        lse_ref[0, 0] = m_scr[:] + jnp.log(l)


def _dq_kernel(img_start_ref, txt_start_ref, txt_end_ref, q_offset_ref,
               q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, kv_valid_ref,
               dq_ref, acc_scr,
               *, scale, block_q, block_kv, num_images, causal):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)
    q_start = qi * block_q + q_offset_ref[b]
    k_start = kj * block_kv

    @pl.when(kj == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(_overlap(q_start, k_start, block_q, block_kv, num_images, causal,
                      img_start_ref, txt_start_ref, txt_end_ref, b))
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        g = g_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT
        ) * scale
        ok = _tile_mask(q_start, k_start, block_q, block_kv, num_images,
                        causal, img_start_ref, txt_start_ref, txt_end_ref,
                        kv_valid_ref, b)
        p = jnp.where(ok, jnp.exp(s - lse_ref[0, 0][:, :1]), 0.0)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT
        )
        ds = p * (dp - delta_ref[0, 0][:, :1]) * scale
        acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    @pl.when(kj == nk - 1)
    def _():
        dq_ref[0, 0] = acc_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(img_start_ref, txt_start_ref, txt_end_ref, q_offset_ref,
                q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, kv_valid_ref,
                dk_ref, dv_ref, dk_scr, dv_scr,
                *, scale, block_q, block_kv, num_images, causal):
    b = pl.program_id(0)
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)
    q_start = qi * block_q + q_offset_ref[b]
    k_start = kj * block_kv

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(_overlap(q_start, k_start, block_q, block_kv, num_images, causal,
                      img_start_ref, txt_start_ref, txt_end_ref, b))
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        g = g_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT
        ) * scale
        ok = _tile_mask(q_start, k_start, block_q, block_kv, num_images,
                        causal, img_start_ref, txt_start_ref, txt_end_ref,
                        kv_valid_ref, b)
        p = jnp.where(ok, jnp.exp(s - lse_ref[0, 0][:, :1]), 0.0)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT
        )
        ds = p * (dp - delta_ref[0, 0][:, :1]) * scale
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _row_stats_spec(block_q):
    # (B, H, T_pad, 128) lane-broadcast row scalars
    return pl.BlockSpec(
        (1, 1, block_q, 128), lambda bb, hh, i, j, *_: (bb, hh, i, 0)
    )


def _compute_lse_and_pads(
    q, k, v, g, img_start, txt_start, txt_end, kv_valid, q_offset,
    causal, scale, block_q, block_kv, interpret,
):
    b, t, h, d = q.shape
    s_len, hkv = k.shape[1], k.shape[2]
    group = h // hkv
    n_img = img_start.shape[1]

    d_pad = max(128, ((d + 127) // 128) * 128)
    block_q = min(block_q, max(128, ((t + 127) // 128) * 128))
    block_kv = min(block_kv, max(128, ((s_len + 127) // 128) * 128))
    t_pad = ((t + block_q - 1) // block_q) * block_q
    s_pad = ((s_len + block_kv - 1) // block_kv) * block_kv

    def pad_to(x, size, axis):
        padw = [(0, 0)] * x.ndim
        padw[axis] = (0, size - x.shape[axis])
        return jnp.pad(x, padw) if size != x.shape[axis] else x

    qt = pad_to(pad_to(q, t_pad, 1), d_pad, 3).transpose(0, 2, 1, 3)
    gt = pad_to(pad_to(g, t_pad, 1), d_pad, 3).transpose(0, 2, 1, 3)
    # expand GQA KV to the full head count (dk/dv group-summed at the end)
    if group > 1:
        k = jnp.repeat(k, group, axis=2)
        v = jnp.repeat(v, group, axis=2)
    kt = pad_to(pad_to(k, s_pad, 1), d_pad, 3).transpose(0, 2, 1, 3)
    vt = pad_to(pad_to(v, s_pad, 1), d_pad, 3).transpose(0, 2, 1, 3)
    kv_valid_p = pad_to(kv_valid.astype(jnp.int32), s_pad, 1)[:, None, :]

    nq, nk = t_pad // block_q, s_pad // block_kv
    qspec = pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda bb, hh, i, j, *_: (bb, hh, i, 0))
    kspec = pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda bb, hh, i, j, *_: (bb, hh, j, 0))
    valid_spec = pl.BlockSpec((1, 1, block_kv),
                              lambda bb, hh, i, j, *_: (bb, 0, j))

    common = dict(scale=scale, block_q=block_q, block_kv=block_kv,
                  num_images=n_img, causal=causal)
    scalars = (img_start, txt_start, txt_end, q_offset.astype(jnp.int32))

    lse = pl.pallas_call(
        functools.partial(_lse_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, h, nq, nk),
            in_specs=[qspec, kspec, valid_spec],
            out_specs=_row_stats_spec(block_q),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalars, qt, kt, kv_valid_p)

    dims = (b, h, t, d, s_len, hkv, group, d_pad, t_pad, s_pad,
            block_q, block_kv, nq, nk)
    return lse, qt, kt, vt, gt, kv_valid_p, scalars, dims, common


def run_backward(
    q, k, v, o, g, img_start, txt_start, txt_end, kv_valid, q_offset,
    causal, scale, block_q, block_kv, interpret,
):
    """Full backward: returns (dq, dk, dv) with original shapes/dtypes."""
    lse, qt, kt, vt, gt, kv_valid_p, scalars, dims, common = (
        _compute_lse_and_pads(
            q, k, v, g, img_start, txt_start, txt_end, kv_valid, q_offset,
            causal, scale, block_q, block_kv, interpret,
        )
    )
    (b, h, t, d, s_len, hkv, group, d_pad, t_pad, s_pad,
     block_q, block_kv, nq, nk) = dims

    delta = jnp.einsum(
        "bthd,bthd->bht", g.astype(jnp.float32), o.astype(jnp.float32)
    )  # (B, H, T)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, t_pad - t)))
    delta = jnp.broadcast_to(delta[..., None], (b, h, t_pad, 128))

    qspec = pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda bb, hh, i, j, *_: (bb, hh, i, 0))
    kspec = pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda bb, hh, i, j, *_: (bb, hh, j, 0))
    valid_spec = pl.BlockSpec((1, 1, block_kv),
                              lambda bb, hh, i, j, *_: (bb, 0, j))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, h, nq, nk),
            in_specs=[qspec, kspec, kspec, qspec,
                      _row_stats_spec(block_q), _row_stats_spec(block_q),
                      valid_spec],
            out_specs=qspec,
            scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalars[:4], qt, kt, vt, gt, lse, delta, kv_valid_p)

    # dkv: swap inner grid order (kv outer, q inner)
    qspec_kv = pl.BlockSpec((1, 1, block_q, d_pad),
                            lambda bb, hh, j, i, *_: (bb, hh, i, 0))
    kspec_kv = pl.BlockSpec((1, 1, block_kv, d_pad),
                            lambda bb, hh, j, i, *_: (bb, hh, j, 0))
    stats_kv = pl.BlockSpec((1, 1, block_q, 128),
                            lambda bb, hh, j, i, *_: (bb, hh, i, 0))
    valid_kv = pl.BlockSpec((1, 1, block_kv),
                            lambda bb, hh, j, i, *_: (bb, 0, j))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, h, nk, nq),
            in_specs=[qspec_kv, kspec_kv, kspec_kv, qspec_kv,
                      stats_kv, stats_kv, valid_kv],
            out_specs=(kspec_kv, kspec_kv),
            scratch_shapes=[
                pltpu.VMEM((block_kv, d_pad), jnp.float32),
                pltpu.VMEM((block_kv, d_pad), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, d_pad), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalars[:4], qt, kt, vt, gt, lse, delta, kv_valid_p)

    dq = dq.transpose(0, 2, 1, 3)[:, :t, :, :d]
    dk = dk.transpose(0, 2, 1, 3)[:, :s_len, :, :d]
    dv = dv.transpose(0, 2, 1, 3)[:, :s_len, :, :d]
    if group > 1:
        dk = dk.reshape(b, s_len, hkv, group, d).sum(3)
        dv = dv.reshape(b, s_len, hkv, group, d).sum(3)
    return dq, dk, dv
