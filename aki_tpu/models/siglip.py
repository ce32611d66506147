"""SigLIP vision transformer (SO400M geometry), TPU-first.

Numerics match HF ``SiglipVisionTransformer`` (the reference's frozen vision
encoder, ``src/factory.py:70-84``): patch embed + learned positions,
pre-norm encoder blocks with biased QKV/MLP, ``gelu_pytorch_tanh``, final
post-layernorm.  AKI consumes ``last_hidden_state`` (729 patch tokens) and
never the pooling head (``src/vlm.py:202-203``), so the attention-pool MAP
head is intentionally omitted.

TPU-first choices: the patch convolution is a reshape + one big matmul
(a 14x14 stride-14 conv is exactly a patchify-matmul — lands on the MXU
instead of a conv window walk); encoder layers are stacked and scanned;
images are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import dense_attention
from .common import Params, Policy, layernorm
from .configs import SigLIPVisionConfig
from .quant import gelu_quant_acts, is_quantized, mm, norm_quant_acts


def init_siglip(key, cfg: SigLIPVisionConfig, dtype=jnp.float32) -> Params:
    d, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    p, c = cfg.patch_size, cfg.num_channels
    ks = jax.random.split(key, 8)
    s = 0.02

    def w(k, *shape):
        return jax.random.normal(k, shape, dtype) * s

    def ln(shape_d):
        return {
            "scale": jnp.ones((L, shape_d), dtype),
            "bias": jnp.zeros((L, shape_d), dtype),
        }

    return {
        "patch_embed": {"w": w(ks[0], p * p * c, d), "b": jnp.zeros((d,), dtype)},
        "pos_embed": w(ks[1], cfg.num_patches, d),
        "layers": {
            "ln1": ln(d),
            "wq": w(ks[2], L, d, d), "bq": jnp.zeros((L, d), dtype),
            "wk": w(ks[3], L, d, d), "bk": jnp.zeros((L, d), dtype),
            "wv": w(ks[4], L, d, d), "bv": jnp.zeros((L, d), dtype),
            "wo": w(ks[5], L, d, d), "bo": jnp.zeros((L, d), dtype),
            "ln2": ln(d),
            "fc1": {"w": w(ks[6], L, d, inter), "b": jnp.zeros((L, inter), dtype)},
            "fc2": {"w": w(ks[7], L, inter, d), "b": jnp.zeros((L, d), dtype)},
        },
        "post_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, C) -> (B, nh*nw, patch*patch*C), row-major patches.

    Matches conv-valid semantics: trailing pixels that don't fill a patch
    are dropped (SigLIP-384/patch14 really uses 27x14=378 of 384 px).
    """
    b, h, w, c = images.shape
    nh, nw = h // patch, w // patch
    images = images[:, : nh * patch, : nw * patch]
    x = images.reshape(b, nh, patch, nw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b nh nw ph pw c
    return x.reshape(b, nh * nw, patch * patch * c)


def siglip_forward(
    params: Params,
    cfg: SigLIPVisionConfig,
    images: jax.Array,
    policy: Policy = Policy(),
    tp_mesh=None,
) -> jax.Array:
    """Encode images.

    Args:
        images: (B, H, W, C) preprocessed pixels (bicubic 384, (x-0.5)/0.5).

    Returns:
        (B, num_patches, hidden) last_hidden_state in compute dtype.
    """
    eps = cfg.layer_norm_eps
    nh, dh = cfg.num_heads, cfg.head_dim
    pp = policy.cast(params)

    x = patchify(images.astype(policy.compute_dtype), cfg.patch_size)
    x = x @ pp["patch_embed"]["w"] + pp["patch_embed"]["b"]
    x = x + pp["pos_embed"]

    use_flash = jax.default_backend() == "tpu"

    def body(x, lp):
        b, t, d = x.shape
        # fused layernorm+quantize (one HBM pass) when serving int8;
        # plain layernorm otherwise — decided from the probe kernel
        h = norm_quant_acts("ln", lp["ln1"], x, eps,
                            probe=lp.get("wqkv", lp.get("wq")))
        if "wqkv" in lp:
            # serving-time fused+quantized QKV (models/quant.py)
            qkv = mm(h, lp["wqkv"]) + lp["bqkv"]
            q = qkv[..., :d].reshape(b, t, nh, dh)
            k = qkv[..., d:2 * d].reshape(b, t, nh, dh)
            v = qkv[..., 2 * d:].reshape(b, t, nh, dh)
        else:
            q = (mm(h, lp["wq"]) + lp["bq"]).reshape(b, t, nh, dh)
            k = (mm(h, lp["wk"]) + lp["bk"]).reshape(b, t, nh, dh)
            v = (mm(h, lp["wv"]) + lp["bv"]).reshape(b, t, nh, dh)
        if use_flash and tp_mesh is not None:
            from ..ops.flash_mma import flash_mma_attention_tp

            attn = flash_mma_attention_tp(q, k, v, mesh=tp_mesh,
                                          causal=False)
        elif use_flash and is_quantized(lp.get("wqkv", lp.get("wq"))):
            # SERVING fast path (detected via the quantized weights):
            # plain XLA einsums beat the (DMA-ceiling-bound) flash kernel
            # at encoder shapes — see encoder_attention_xla's docstring.
            # Training keeps the flash kernel: its custom_vjp stores no
            # (T, S) tensors in HBM, while this path would save O(T^2)
            # f32 score residuals per layer and add bf16-prob rounding
            # to gradients.
            from ..ops.attention import encoder_attention_xla

            attn = encoder_attention_xla(q, k, v)
        elif use_flash:
            from ..ops.flash_mma import flash_mma_attention

            attn = flash_mma_attention(q, k, v, causal=False)
        else:
            attn = dense_attention(q, k, v, causal=False)
        x = x + (mm(attn.reshape(b, t, d), lp["wo"]) + lp["bo"])
        h2 = norm_quant_acts("ln", lp["ln2"], x, eps, probe=lp["fc1"]["w"])
        y1 = mm(h2, lp["fc1"]["w"])
        # fused gelu(y1 + b) + quantize when fc2 is int8 and the fc1 width
        # is lane-aligned (quantize_params pads 4304 -> 4352 for this)
        h2g = gelu_quant_acts(y1, lp["fc1"]["b"], probe=lp["fc2"]["w"])
        x = x + (mm(h2g, lp["fc2"]["w"]) + lp["fc2"]["b"])
        return x, None

    x, _ = jax.lax.scan(body, x, pp["layers"])
    return layernorm(pp["post_ln"], x, eps)
