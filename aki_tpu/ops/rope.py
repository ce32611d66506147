"""Rotary position embeddings with Phi-3.5 LongRoPE support.

Matches HF's Phi-3 rotary implementation semantics (neox-style rotate-half
over the full head dim).  LongRoPE rescales inverse frequencies by a
per-frequency factor array and multiplies cos/sin by an attention scaling
factor ``sqrt(1 + ln(s)/ln(orig_max))``; the short-factor branch applies for
sequences within ``original_max_position_embeddings`` — always the case for
AKI's <1k-token sequences.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    head_dim: int
    theta: float = 10000.0
    max_position_embeddings: int = 131072
    original_max_position_embeddings: int = 4096
    # LongRoPE per-frequency factors, length head_dim // 2 (None = plain RoPE)
    short_factor: tuple[float, ...] | None = None
    long_factor: tuple[float, ...] | None = None

    @property
    def attention_scaling(self) -> float:
        if self.short_factor is None:
            return 1.0
        scale = self.max_position_embeddings / self.original_max_position_embeddings
        if scale <= 1.0:
            return 1.0
        import math

        return math.sqrt(
            1.0 + math.log(scale) / math.log(self.original_max_position_embeddings)
        )


def rope_cos_sin(cfg: RopeConfig, positions: jax.Array, long_context: bool = False):
    """cos/sin tables for given positions.

    Args:
        positions: int array (..., T).
    Returns:
        (cos, sin) of shape (..., T, head_dim), fp32.
    """
    half = cfg.head_dim // 2
    freqs = jnp.arange(0, half, dtype=jnp.float32)
    inv_freq = 1.0 / (cfg.theta ** (2.0 * freqs / cfg.head_dim))
    factor = cfg.long_factor if long_context else cfg.short_factor
    if factor is not None:
        inv_freq = inv_freq / jnp.asarray(factor, jnp.float32)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., T, half)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., T, head_dim)
    scaling = cfg.attention_scaling
    return jnp.cos(angles) * scaling, jnp.sin(angles) * scaling


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


@functools.lru_cache(maxsize=8)
def _rotate_matrix(d: int):
    """Signed permutation R with ``rotate_half(x) == x @ R``.

    TPU-first trick: neox rotate-half is a lane slice at d/2 + concat —
    a sub-128-lane relayout Mosaic/XLA execute as multiple slow passes
    (measured 0.91 ms/layer at AKI-4B prefill shapes, 2x the matmul that
    produced x). As a (D, D) matmul it rides the MXU and, because each
    output row has exactly ONE +-1 entry, the f32-accumulated dot is
    BIT-EXACT vs the slice/concat form (verified: maxerr 0.0) at
    0.38 ms/layer — 2.4x faster.
    """
    import numpy as np

    half = d // 2
    r = np.zeros((d, d), np.float32)
    for j in range(half):
        r[half + j, j] = -1.0
        r[j, half + j] = 1.0
    return r  # numpy on purpose: a jnp constant here would cache a tracer


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding (neox rotate-half, via the matmul-R form).

    Args:
        x: (B, T, H, D)
        cos/sin: (B, T, D) or (T, D)
    """
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    r = jnp.asarray(_rotate_matrix(x.shape[-1]), x.dtype)
    # bf16 operands: DEFAULT precision is already exact (one +-1 term per
    # row, f32 accumulate). f32 operands (fp32 fine-tuning): DEFAULT would
    # quantize x to bf16 first — pin HIGHEST to keep the permutation exact.
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # preferred_element_type follows x.dtype: each output row has exactly
    # ONE +-1 entry, so no accumulation ever happens and a bf16 dot output
    # is still BIT-exact (rot elements are +-x values, bf16-representable).
    # This matters under remat: dots_with_no_batch_dims_saveable keeps this
    # dot's output as a per-layer residual, and an f32 output doubled the
    # largest training residual (measured f32[6,8,655,32,96] ~ 0.5 GB at
    # depth 6 — see exp/train_bench.py / PERF.md round 5).
    rot = jnp.einsum("bthd,de->bthe", x, r,
                     preferred_element_type=x.dtype, precision=prec)
    out = x.astype(jnp.float32) * cos + rot * sin
    return out.astype(x.dtype)
