"""Decoupled embedding + LM head for framework-added special tokens.

Reproduces the reference's ``DecoupledEmbedding`` / ``DecoupledLinear``
(``src/helpers.py:350-613``, from HF IDEFICS): the backbone's embedding
table is left untouched (tokenizer growth never resizes it,
``src/factory.py:140-150``); ids above ``max_original_id`` route to a small
extra table, and the head truncates backbone logits to
``initial_tokenizer_len`` before concatenating the extra columns — so output
vocab is ``initial_tokenizer_len + num_extra``.

On TPU this is a branchless ``jnp.where`` over two gathers and a fused
concat-matmul — no Python routing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Params
from .quant import mm, take_columns


def init_decoupled(key, hidden: int, num_extra: int, vocab_size: int,
                   initializer_range: float = 0.02, dtype=jnp.float32) -> Params:
    """The reference's DecoupledLinear is constructed with ``bias=True``
    (helpers.py:494-586 default), so both the base head and the extra head
    carry biases in every AKI checkpoint. Scratch init zeroes them (a no-op
    until trained); the converter loads the checkpoint values."""
    k1, k2, k3 = jax.random.split(key, 3)
    s = initializer_range
    return {
        "extra_embed": {"table": jax.random.normal(k1, (num_extra, hidden), dtype) * s},
        "lm_head": {"w": jax.random.normal(k2, (hidden, vocab_size), dtype) * s,
                    "b": jnp.zeros((vocab_size,), dtype)},
        "extra_head": {"w": jax.random.normal(k3, (hidden, num_extra), dtype) * s,
                       "b": jnp.zeros((num_extra,), dtype)},
    }


def decoupled_lookup(
    base_table: jax.Array,
    extra_table: jax.Array,
    ids: jax.Array,
    initial_tokenizer_len: int,
) -> jax.Array:
    """Embed ids; ids >= initial_tokenizer_len hit the extra table
    (helpers.py:445-484)."""
    is_extra = ids >= initial_tokenizer_len
    base_ids = jnp.where(is_extra, 0, ids)
    extra_ids = jnp.where(is_extra, ids - initial_tokenizer_len, 0)
    # mode="clip": jnp.take's default fills float OOB gathers with NaN,
    # which would silently poison the loss on any id-layout mismatch
    base = jnp.take(base_table, base_ids, axis=0, mode="clip")
    extra = jnp.take(extra_table, extra_ids, axis=0, mode="clip")
    return jnp.where(is_extra[..., None], extra.astype(base.dtype), base)


def decoupled_logits(
    hidden: jax.Array,
    head_w: jax.Array,
    extra_w: jax.Array,
    initial_tokenizer_len: int,
    head_b: jax.Array | None = None,
    extra_b: jax.Array | None = None,
) -> jax.Array:
    """Logits over initial_tokenizer_len + num_extra ids (helpers.py:594-603).

    The base head is truncated to the live vocab *before* the matmul — the
    dead padded columns (32011..32063 for Phi-3.5) never cost FLOPs. Biases
    (DecoupledLinear bias=True) add after, truncated the same way.
    """
    base = mm(hidden, take_columns(head_w, initial_tokenizer_len))
    if head_b is not None:
        base = base + head_b[:initial_tokenizer_len].astype(base.dtype)
    extra = hidden @ extra_w
    if extra_b is not None:
        extra = extra + extra_b.astype(extra.dtype)
    return jnp.concatenate([base, extra], axis=-1)
