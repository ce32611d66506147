"""Perceiver resampler: image patch features -> fixed vision tokens.

Matches the reference resampler (``src/helpers.py:62-199``) behaviorally:

- learned latents (144 for AKI, ``src/aki.py:40-43``);
- per block: latent cross-attention where K/V span ``concat(media, latents)``
  with *separate* pre-norms for media and latents, softmax stabilization,
  residual to the un-normed latents; then a LayerNorm-first FF (GELU exact,
  no biases on the two projections) with residual;
- final LayerNorm then a biased linear projection to the LM width.

Frame/media-time embeddings (video path) are omitted: AKI is single-frame
(``src/vlm.py:191``) and the reference never instantiates them
(``max_num_media=max_num_frames=None``).

Blocks are stacked + scanned.  The (144, 729+144) attention is small; a
dense fp32-softmax einsum is already MXU-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Params, Policy, layernorm
from .configs import PerceiverConfig


def init_perceiver(key, cfg: PerceiverConfig, dtype=jnp.float32) -> Params:
    d, inner = cfg.dim, cfg.dim_head * cfg.heads
    ff_inner = int(d * cfg.ff_mult)
    L = cfg.depth
    ks = jax.random.split(key, 8)

    def w(k, *shape, scale=0.02):
        return jax.random.normal(k, shape, dtype) * scale

    def ln(dim):
        return {"scale": jnp.ones((L, dim), dtype), "bias": jnp.zeros((L, dim), dtype)}

    return {
        # reference initializes latents ~ N(0, 1) (helpers.py:143)
        "latents": jax.random.normal(ks[0], (cfg.num_latents, d), dtype),
        "layers": {
            "norm_media": ln(d),
            "norm_latents": ln(d),
            "to_q": w(ks[1], L, d, inner),
            "to_kv": w(ks[2], L, d, 2 * inner),
            "to_out": w(ks[3], L, inner, d),
            "ff_ln": ln(d),
            "ff1": w(ks[4], L, d, ff_inner),
            "ff2": w(ks[5], L, ff_inner, d),
        },
        "norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "proj": {"w": w(ks[6], d, cfg.dim_inner), "b": jnp.zeros((cfg.dim_inner,), dtype)},
    }


def perceiver_forward(
    params: Params,
    cfg: PerceiverConfig,
    features: jax.Array,
    policy: Policy = Policy(),
    remat: bool = False,
) -> jax.Array:
    """Resample patch features to ``num_latents`` tokens.

    Args:
        features: (B, v, dim) vision encoder outputs.
        remat: checkpoint each layer under the decoder's dots policy —
            the f32 (B, H, latents, media) attention logits this scan
            otherwise saves per layer were the 3rd-largest training
            buffer (283 MB at 4B bs-12, round-5 OOM dump); the attention
            einsums are batched dots (not saveable) so they recompute,
            while the ff dot outputs stay saved.

    Returns:
        (B, num_latents, dim_inner) vision tokens.
    """
    h, dh = cfg.heads, cfg.dim_head
    scale = dh ** -0.5
    pp = policy.cast(params)

    b = features.shape[0]
    x = features.astype(policy.compute_dtype)
    latents = jnp.broadcast_to(pp["latents"], (b,) + pp["latents"].shape)

    def body(latents, lp):
        xm = layernorm(lp["norm_media"], x)
        ln_lat = layernorm(lp["norm_latents"], latents)
        q = (ln_lat @ lp["to_q"]).reshape(b, -1, h, dh)
        kv_in = jnp.concatenate([xm, ln_lat], axis=1)
        kv = kv_in @ lp["to_kv"]
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, -1, h, dh)
        v = v.reshape(b, -1, h, dh)

        logits = jnp.einsum(
            "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
        ) * scale
        # softmax stabilization as in helpers.py:97
        logits = logits - jax.lax.stop_gradient(
            jnp.max(logits, axis=-1, keepdims=True)
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "bhij,bjhd->bihd", probs, v, preferred_element_type=jnp.float32
        ).astype(latents.dtype)
        out = out.reshape(b, -1, h * dh) @ lp["to_out"]
        latents = latents + out

        f = layernorm(lp["ff_ln"], latents)
        f = f @ lp["ff1"]
        f = jax.nn.gelu(f.astype(jnp.float32), approximate=False).astype(f.dtype)
        latents = latents + f @ lp["ff2"]
        return latents, None

    if remat:
        from .phi3 import _remat_policy

        body = jax.checkpoint(body, policy=_remat_policy())
    latents, _ = jax.lax.scan(body, latents, pp["layers"])
    latents = layernorm(pp["norm"], latents)
    return latents @ pp["proj"]["w"] + pp["proj"]["b"]
