"""Modality-mutual attention (MMA) mask specification.

The reference (``codes/open_flamingo/src/vlm.py:410-443``) materializes a
dense per-sample ``(1, T, T)`` 0/1 mask on the host with Python loops and
hands it to HF as a 4D attention mask.  On TPU we never materialize that
mask outside a kernel: attention masking is fully described by three scalars
per (sample, image) — the *block spec* — and evaluated on the fly either by
``jnp.where`` in the dense reference path or by block predicates inside the
Pallas flash kernel.

Behavioral contract (matches ``vlm.py:424-429`` exactly):

    attend(q, k) = valid_k  AND  ( k <= q
                                   OR (img_start <= q < txt_start
                                       AND txt_start <= k < txt_end) )

where, for a single image spliced at text position ``p`` with ``n_vis``
vision tokens and the ``<|assistant|>`` token at text position ``a``:

    img_start = p
    txt_start = p + n_vis
    txt_end   = a + n_vis          # vlm.py:556-560; note this *includes*
                                   # the <|assistant|> token itself (spliced
                                   # position a + n_vis - 1 < txt_end).

Degenerate cases reproduce the reference behavior:

- no ``<|assistant|>`` token (pretraining captions): ``a = 0`` so
  ``txt_end = n_vis <= txt_start`` — empty block, pure causal
  (``vlm.py:492-496``).
- no image: ``img_start = txt_start = 0`` and ``txt_end = a`` — empty block
  (``vlm.py:498-512``).

Ablation modes ride the same spec (one kernel for all three):

- ``causal``: spec with an empty block (txt_end <= txt_start).
- ``MMA``:    the real block.
- ``DOT``:    text-before-image token *reordering* at splice time with a
              causal spec (the reference notes this as an input-ordering
              ablation at ``vlm.py:461``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MMASpec:
    """Block-mask coordinates, one row per batch element.

    All fields are int32 arrays of shape ``(B,)`` (single image) or
    ``(B, N_img)`` (multi-image; the mask is the union over images).
    Spans are in *spliced* coordinates (vision tokens already inserted).
    """

    img_start: jax.Array
    txt_start: jax.Array
    txt_end: jax.Array

    @property
    def batch(self) -> int:
        return self.img_start.shape[0]

    def with_batch_dim(self) -> "MMASpec":
        """Normalize to (B, N_img) shape."""
        if self.img_start.ndim == 1:
            return MMASpec(
                img_start=self.img_start[:, None],
                txt_start=self.txt_start[:, None],
                txt_end=self.txt_end[:, None],
            )
        return self


def causal_spec(batch: int) -> MMASpec:
    """A spec whose MMA block is empty — plain causal attention."""
    z = jnp.zeros((batch,), dtype=jnp.int32)
    return MMASpec(img_start=z, txt_start=z, txt_end=z)


def allowed_mask(
    spec: MMASpec,
    q_len: int,
    kv_len: int,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    kv_offset: jax.Array | int = 0,
) -> jax.Array:
    """Dense boolean mask ``(B, q_len, kv_len)``; True = may attend.

    ``q_offset`` shifts query indices (scalar or ``(B,)``): during decode the
    single query row sits at absolute position ``q_offset``.  ``kv_offset``
    shifts key indices the same way — a ring-SP step evaluates the local
    query rows against a remote K/V block whose columns live at absolute
    positions ``kv_offset .. kv_offset + kv_len``.  ``kv_valid`` is
    an optional ``(B, kv_len)`` 0/1 validity (padding) mask applied to keys,
    mirroring the reference's zeroing of padded columns (``vlm.py:434-438``).
    """
    spec = spec.with_batch_dim()
    b = spec.batch
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (b, q_len, kv_len), 1)
    q_offset = jnp.asarray(q_offset, jnp.int32)
    q_offset = jnp.broadcast_to(q_offset, (b,))
    q_pos = q_pos + q_offset[:, None, None]
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, q_len, kv_len), 2)
    kv_offset = jnp.asarray(kv_offset, jnp.int32)
    k_pos = k_pos + jnp.broadcast_to(kv_offset, (b,))[:, None, None]

    causal = k_pos <= q_pos

    # Union of per-image MMA blocks.  (B, N, 1, 1) vs (B, q, k).
    img_start = spec.img_start[:, :, None, None]
    txt_start = spec.txt_start[:, :, None, None]
    txt_end = spec.txt_end[:, :, None, None]
    blocks = (
        (q_pos[:, None] >= img_start)
        & (q_pos[:, None] < txt_start)
        & (k_pos[:, None] >= txt_start)
        & (k_pos[:, None] < txt_end)
    )
    mma = jnp.any(blocks, axis=1)

    out = causal | mma
    if kv_valid is not None:
        out = out & (kv_valid[:, None, :] != 0)
    return out


def dense_bias(
    spec: MMASpec,
    q_len: int,
    kv_len: int,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    dtype=jnp.float32,
) -> jax.Array:
    """Additive attention bias ``(B, 1, q_len, kv_len)``: 0 where allowed,
    a large negative where masked (what HF's mask inversion produces from the
    reference's 0/1 4D mask)."""
    ok = allowed_mask(spec, q_len, kv_len, kv_valid, q_offset)
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)[:, None]
