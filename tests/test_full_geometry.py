"""Full AKI-4B-geometry rehearsals that need no real weights.

Round-2 verdict: the differential parity tests run at 2-layer tiny
geometry only — nothing exercised the converter key layout or LongRoPE at
the real 32-layer/3072-dim scale. These tests close that:

1. the converter round-trips a full-geometry zero tree through the exact
   reference checkpoint key layout (key-name or shape drift fails here,
   no 15GB download needed);
2. the whole aki_forward traces at real geometry via eval_shape from the
   converted tree;
3. LongRoPE cos/sin match HF ``transformers``' Phi-3 implementation at
   the published Phi-3.5-mini rope_scaling values, on BOTH the short
   (< 4096) and long (> 4096) branches (``src/factory.py:110-115`` loads
   the real config, so this is what a converted checkpoint runs with).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aki_tpu.models.aki import aki_forward, init_aki
from aki_tpu.models.configs import (
    PHI35_MINI_LONG_FACTOR, PHI35_MINI_SHORT_FACTOR, aki_4b,
)
from aki_tpu.convert.jax_to_torch import export_aki_checkpoint
from aki_tpu.convert.torch_to_jax import convert_aki_checkpoint

# reference checkpoint key layout, transcribed from the reference's module
# tree (src/aki.py / src/helpers.py / train_utils.py:376-410) — literal
# strings so converter drift cannot silently re-derive them
EXPECTED_KEY_PATTERNS = [
    "lang_model.model.embed_tokens.weight",
    "lang_model.model.embed_tokens.additional_embedding.weight",
    "lang_model.model.layers.0.input_layernorm.weight",
    "lang_model.model.layers.0.self_attn.qkv_proj.weight",
    "lang_model.model.layers.0.self_attn.o_proj.weight",
    "lang_model.model.layers.0.post_attention_layernorm.weight",
    "lang_model.model.layers.0.mlp.gate_up_proj.weight",
    "lang_model.model.layers.0.mlp.down_proj.weight",
    "lang_model.model.layers.31.mlp.down_proj.weight",
    "lang_model.model.norm.weight",
    "lang_model.lm_head.weight",
    "lang_model.lm_head.bias",
    "lang_model.lm_head.additional_fc.weight",
    "lang_model.lm_head.additional_fc.bias",
    "vision_tokenizer.latents",
    "vision_tokenizer.layers.0.0.to_q.weight",
    "vision_tokenizer.layers.0.0.to_kv.weight",
    "vision_tokenizer.layers.0.0.to_out.weight",
    "vision_tokenizer.layers.0.1.1.weight",
    "vision_tokenizer.layers.0.1.3.weight",
    "vision_tokenizer.norm.weight",
    "vision_tokenizer.projection.weight",
    "vision_tokenizer.projection.bias",
]


@pytest.mark.slow
def test_converter_full_4b_roundtrip_and_trace():
    cfg = aki_4b()
    shapes = jax.eval_shape(
        lambda k: init_aki(k, cfg), jax.random.PRNGKey(0)
    )

    # zero tree at real geometry (calloc — cheap until written)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)

    sd = export_aki_checkpoint(zeros)
    for key in EXPECTED_KEY_PATTERNS:
        assert key in sd, f"reference key missing from export: {key}"
    # reference checkpoints carry no vision encoder (train_utils.py:376)
    assert not any(k.startswith("vision_encoder.") for k in sd)

    # fused-qkv / gate_up shapes at the real Phi-3.5-mini geometry
    assert sd["lang_model.model.layers.0.self_attn.qkv_proj.weight"].shape \
        == (9216, 3072)
    assert sd["lang_model.model.layers.0.mlp.gate_up_proj.weight"].shape \
        == (16384, 3072)
    assert sd["lang_model.model.embed_tokens.weight"].shape == (32064, 3072)

    back = convert_aki_checkpoint(sd, cfg)
    del sd

    # every non-frozen leaf must come back with the init shape/dtype-shape
    flat_init = dict(jax.tree_util.tree_leaves_with_path(shapes))
    flat_back = dict(jax.tree_util.tree_leaves_with_path(back))
    missing = []
    for path, want in flat_init.items():
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        if p.startswith("siglip"):
            continue  # frozen encoder: loaded separately from HF
        got = flat_back.get(path)
        if got is None:
            missing.append(p)
        else:
            assert got.shape == want.shape, (p, got.shape, want.shape)
    assert not missing, missing

    # the full 32-layer forward traces from the converted tree (shapes
    # only — proves geometry consistency end-to-end without compute)
    back["siglip"] = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.float32),
        {k: v for k, v in shapes.items() if k == "siglip"}["siglip"],
    )
    abstract = jax.tree.map(
        lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(x.shape, jnp.float32),
        back,
    )
    b, t = 2, 512
    out = jax.eval_shape(
        lambda p, ids, im, av: aki_forward(p, cfg, ids, im, av,
                                           use_flash=False),
        abstract,
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        jax.ShapeDtypeStruct((b, 384, 384, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, t), jnp.int32),
    )
    assert out.logits.shape == (b, t + 144 - 1, cfg.output_vocab)


def test_longrope_matches_hf_transformers():
    import torch
    from transformers.models.phi3.configuration_phi3 import Phi3Config
    from transformers.models.phi3.modeling_phi3 import Phi3RotaryEmbedding

    from aki_tpu.ops.rope import RopeConfig, rope_cos_sin

    hf_cfg = Phi3Config(
        hidden_size=3072, num_attention_heads=32,
        max_position_embeddings=131072,
        original_max_position_embeddings=4096,
        rope_theta=10000.0,
        rope_scaling={
            "type": "longrope",
            "short_factor": list(PHI35_MINI_SHORT_FACTOR),
            "long_factor": list(PHI35_MINI_LONG_FACTOR),
        },
    )
    ours_cfg = RopeConfig(
        head_dim=96, theta=10000.0,
        max_position_embeddings=131072,
        original_max_position_embeddings=4096,
        short_factor=PHI35_MINI_SHORT_FACTOR,
        long_factor=PHI35_MINI_LONG_FACTOR,
    )

    rot = Phi3RotaryEmbedding(config=hf_cfg)

    def hf_cos_sin(positions):
        pos = torch.tensor(positions)[None]
        x = torch.zeros((1, 1, 1), dtype=torch.float32)
        cos, sin = rot(x, pos)
        return cos[0].numpy(), sin[0].numpy()

    # short branch: positions within the original 4k context
    pos_short = np.arange(0, 800, dtype=np.int64)
    hc, hs = hf_cos_sin(pos_short)
    oc, os_ = rope_cos_sin(ours_cfg, jnp.asarray(pos_short))
    # f32 trig: HF evaluates pos * inv_freq with a different association
    # order; agreement is ~1e-4 absolute
    np.testing.assert_allclose(np.asarray(oc), hc, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(os_), hs, rtol=1e-4, atol=2e-4)

    # long branch: a sequence crossing 4096 — HF switches to long_factor
    # for the whole sequence when seq_len > original_max
    pos_long = np.arange(0, 5000, dtype=np.int64)
    hc, hs = hf_cos_sin(pos_long)
    oc, os_ = rope_cos_sin(ours_cfg, jnp.asarray(pos_long),
                           long_context=True)
    # f32 trig at large angles (pos up to 5000): HF computes pos * inv_freq
    # in a different association order; worst-case ~6e-4 absolute near
    # zero-crossings (cos/sin are O(1), so atol=1e-3 still pins the table)
    np.testing.assert_allclose(np.asarray(oc), hc, atol=1e-3)
    np.testing.assert_allclose(np.asarray(os_), hs, atol=1e-3)
