"""Fused single-pass "elementwise + per-row int8 quantize" Pallas kernels.

The W8A8 serving path (``models/quant.py``) quantizes activations per token
row before every int8 matmul.  Composed in XLA, each norm -> quantize
handoff costs ~4 HBM passes over the activation (norm reduction, normalized
write, row-amax reduction, quantized write) because the row-max reduction
cannot fuse into its producer.  These kernels do the whole chain in ONE
read + one int8 write: the row fits in a VMEM tile, so mean/var/amax are
in-register reductions.

Three fusions cover every act-quant site in the serving forward:

- :func:`rmsnorm_quant`   — decoder pre-attention / pre-MLP (Phi-3).
- :func:`layernorm_quant` — vision tower pre-attention / pre-MLP (SigLIP).
- :func:`silu_mul_quant`  — decoder MLP gate activation -> w_down operand.
- :func:`gelu_quant`      — vision MLP fc1 -> fc2 operand (tanh gelu).

Each returns ``(q int8, s f32)`` with ``s`` shaped ``(..., 1)`` exactly like
``models/quant.quantize_acts`` — consumers feed the int8 x int8 dot and
rescale by ``s``.  Numerics: the kernel keeps the pre-quantization value in
f32 end to end (see ``_quantize_rows``); vs the composed path this moves
~1% of int8 values by one ulp — inside the quantization noise floor.

The reference has no analogue (its CUDA stack serves in fp16/bf16;
quantized serving is beyond `local_demo.py`) — this is TPU-first serving
plumbing for the measured v5e gap between XLA's fused-elementwise streaming
(~390-530 GB/s but multiple passes) and one Pallas pass at ~260 GB/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_M = 512


def _pick_block_m(rows: int, d: int, n_row_operands: int) -> int:
    """Row-block size: keep the working set (n f32 row tensors + the int8
    out) inside the ~16 MB scoped-VMEM budget with double buffering."""
    budget = 6 * 1024 * 1024  # bytes of f32 per row operand, conservative
    bm = budget // (4 * d * max(1, n_row_operands))
    bm = max(8, min(_BLOCK_M, (bm // 8) * 8))
    return min(bm, ((rows + 7) // 8) * 8)


def _quantize_rows(h, q_ref, s_ref):
    """Per-row symmetric int8 over the last dim; h is f32 (bm, d).

    Values stay f32 end to end — the composed path nominally round-trips
    through bf16 between norm and quantize, but XLA itself elides that
    rounding when it fuses the chain, so there is no bit-stable reference;
    full f32 is the more accurate choice (mismatches vs the composition
    are confined to +-1 int8 ulps on ~1% of values).
    """
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.where(amax == 0, 1.0, amax / 127.0)
    q_ref[...] = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    s_ref[...] = jnp.broadcast_to(s, s_ref.shape)


def _rms_quant_kernel(x_ref, g_ref, q_ref, s_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    h = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + eps)
    h = h * g_ref[...].astype(jnp.float32)
    _quantize_rows(h, q_ref, s_ref)


def _ln_quant_kernel(x_ref, g_ref, b_ref, q_ref, s_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, -1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = h * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    _quantize_rows(h, q_ref, s_ref)


def _silu_mul_quant_kernel(g_ref, u_ref, q_ref, s_ref):
    g = g_ref[...].astype(jnp.float32)
    h = jax.nn.silu(g) * u_ref[...].astype(jnp.float32)
    _quantize_rows(h, q_ref, s_ref)


def _gelu_quant_kernel(x_ref, b_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(x, approximate=True)
    _quantize_rows(h, q_ref, s_ref)


def _run(kernel, n_vec_in, x, *vecs, interpret=None):
    """Shared pallas_call wrapper: rows = flattened leading dims.

    ``n_vec_in`` leading operands of ``vecs`` are (d,) per-column vectors
    (norm scale/bias); any further operands are row tensors like ``x``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead, d = x.shape[:-1], x.shape[-1]
    if d % 128:
        raise ValueError(f"fused quant kernels need 128-multiple cols; {d}")
    rows = 1
    for n in lead:
        rows *= n
    n_row = 1 + max(0, len(vecs) - n_vec_in)
    bm = _pick_block_m(rows, d, n_row)
    grid = (pl.cdiv(rows, bm),)

    row_spec = pl.BlockSpec((bm, d), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0))
    in_specs = [row_spec] + [vec_spec] * n_vec_in
    operands = [x.reshape(rows, d)]
    for v in vecs[:n_vec_in]:
        operands.append(v.reshape(1, d))
    for v in vecs[n_vec_in:]:
        in_specs.append(row_spec)
        operands.append(v.reshape(rows, d))

    q, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), jnp.int8),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return q.reshape(*lead, d), s.reshape(*lead, 1)


def rmsnorm_quant(x, scale, eps: float = 1e-5, *, interpret=None):
    """RMSNorm then per-row int8 quantize, one HBM pass.

    Equivalent to ``quantize_acts(rmsnorm({"scale": scale}, x, eps))``.
    Returns (q int8 like x, s f32 (..., 1)).
    """
    k = functools.partial(_rms_quant_kernel, eps=eps)
    return _run(k, 1, x, scale, interpret=interpret)


def layernorm_quant(x, scale, bias, eps: float = 1e-6, *, interpret=None):
    """LayerNorm then per-row int8 quantize, one HBM pass."""
    k = functools.partial(_ln_quant_kernel, eps=eps)
    return _run(k, 2, x, scale, bias, interpret=interpret)


def silu_mul_quant(gate, up, *, interpret=None):
    """silu(gate) * up then per-row int8 quantize, one HBM pass."""
    return _run(_silu_mul_quant_kernel, 0, gate, up, interpret=interpret)


def gelu_quant(x, bias, *, interpret=None):
    """tanh-gelu(x + bias) then per-row int8 quantize, one HBM pass."""
    return _run(_gelu_quant_kernel, 1, x, bias, interpret=interpret)
