"""apply_rope's matmul-R form must stay BIT-exact vs rotate-half.

The TPU-first trick (``ops/rope.py:_rotate_matrix``): neox rotate-half as a
signed-permutation matmul. Exactness holds because every output row of R has
exactly ONE +-1 entry — no accumulation ever happens — so the dot output is
bit-exact in any output dtype that can represent the inputs. This pins two
load-bearing details:

- bf16 inputs with a bf16 ``preferred_element_type`` (round 5: the f32 dot
  output was the largest saved training residual under
  ``dots_with_no_batch_dims_saveable`` — ~0.5 GB at depth 6);
- f32 inputs with HIGHEST precision (DEFAULT would quantize to bf16 first).

Reference semantics: HF Phi-3 neox rotate-half (modeling_phi3.py
rotate_half/apply_rotary_pos_emb), pinned end-to-end by test_model_parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aki_tpu.ops.rope import RopeConfig, _rotate_half, apply_rope, rope_cos_sin


def _ref_rope(x, cos, sin):
    # rotate-half slice/concat form, f32 elementwise — the semantics oracle
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    out = x.astype(jnp.float32) * c + _rotate_half(x).astype(jnp.float32) * s
    return out.astype(x.dtype)


def test_apply_rope_bitexact_bf16_and_f32():
    cfg = RopeConfig(
        head_dim=96,
        short_factor=tuple(1.0 + 0.01 * i for i in range(48)),
        long_factor=tuple(1.25 for _ in range(48)),
        max_position_embeddings=131072,
    )
    pos = jnp.arange(64)[None]
    cos, sin = rope_cos_sin(cfg, pos)
    for dt in (jnp.bfloat16, jnp.float32):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4, 96), dt)
        ref = _ref_rope(x, cos, sin)
        got = apply_rope(x, cos, sin)
        assert got.dtype == x.dtype
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(got, np.float32)
        )


def test_apply_rope_bitexact_under_jit_default_precision():
    # under jit with DEFAULT matmul precision (the serving configuration —
    # conftest pins HIGHEST globally, so force DEFAULT here) the bf16 path
    # must still be exact: the +-1 permutation has one term per output.
    cfg = RopeConfig(head_dim=32)
    pos = jnp.arange(16)[None]
    cos, sin = rope_cos_sin(cfg, pos)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 32), jnp.bfloat16)
    with jax.default_matmul_precision("default"):
        got = jax.jit(apply_rope)(x, cos, sin)
    ref = _ref_rope(x, cos, sin)
    np.testing.assert_array_equal(
        np.asarray(ref, np.float32), np.asarray(got, np.float32)
    )
