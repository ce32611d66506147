"""Padded-head flat serving layout: numerics match the standard path.

``quantize_params_padded`` pads every attention head to 128 lanes inside
the projection weights (rope-half aligned); the engine then runs the flat
attention kernel + int8 flat-128 KV cache. Since pad lanes are exactly
zero through QK dots, rope, quantization, and wo consumption, generation
must match the standard (unpadded) int8-KV path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import generate, padded_head_dim, prefill
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.models.quant import pad_attention_heads

CFG = aki_tiny()


def _padded_params(params):
    out = dict(params)
    phi3 = dict(params["phi3"])
    layers = dict(phi3["layers"])
    layers.update(pad_attention_heads(
        layers, CFG.phi3.num_heads, CFG.phi3.head_dim
    ))
    phi3["layers"] = layers
    out["phi3"] = phi3
    return out


def _batch(b=2, t=18):
    rng = np.random.RandomState(3)
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    valid[1, -4:] = 0
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return jnp.array(ids), jnp.array(valid), jnp.array(imgs)


def test_flat_generate_matches_standard_kv8():
    params = init_aki(jax.random.PRNGKey(0), CFG)
    padded = _padded_params(params)
    assert padded_head_dim(padded, CFG) == 128
    assert padded_head_dim(params, CFG) is None

    ids, valid, imgs = _batch()
    kw = dict(max_new_tokens=6, max_len=48, policy=F32, use_flash=False,
              kv_int8=True)
    toks_std, _ = generate(params, CFG, ids, imgs, valid, **kw)
    toks_flat, _ = generate(padded, CFG, ids, imgs, valid, **kw)
    np.testing.assert_array_equal(np.asarray(toks_std),
                                  np.asarray(toks_flat))

    st_std = prefill(params, CFG, ids, imgs, valid, max_len=48, policy=F32,
                     use_flash=False, kv_int8=True)
    st_flat = prefill(padded, CFG, ids, imgs, valid, max_len=48, policy=F32,
                      use_flash=False, kv_int8=True)
    np.testing.assert_allclose(
        np.asarray(st_std.last_logits), np.asarray(st_flat.last_logits),
        rtol=2e-3, atol=2e-3,
    )
    # int8 flat-128 cache rows: 4096 int8 B/token vs 6144 B bf16 unpadded
    assert st_flat.cache.k.shape[-1] == CFG.phi3.num_heads * 128


def test_flat_without_kv8_raises():
    import pytest

    params = _padded_params(init_aki(jax.random.PRNGKey(0), CFG))
    ids, valid, imgs = _batch()
    with pytest.raises(ValueError, match="kv_int8"):
        prefill(params, CFG, ids, imgs, valid, max_len=48, policy=F32,
                use_flash=False, kv_int8=False)
