"""Flamingo gated cross-attention fusion — the reference's legacy path.

The reference keeps the OpenFlamingo architecture alongside AKI
(``src/flamingo.py``, ``src/flamingo_lm.py``, ``src/helpers.py:203-346``;
``train/train.py:252-256`` still branches on ``--model_family flamingo``).
Behaviors reproduced:

- ``GatedCrossAttentionBlock`` before every ``cross_attn_every_n`` decoder
  layer: masked text->media cross-attention and a FF, each residual-added
  through a ``tanh`` gate initialized to 0 (identity at init,
  ``helpers.py:322-325``);
- media-location time masking (``helpers.py:263-296``): with
  ``only_attend_immediate_media`` text attends only the most recent
  preceding image (``text_time == media_time``), otherwise all previous
  (``>=``); text before any image gets its cross-attention zeroed;
- the language stream keeps the ``<image>`` tokens (no splice); the decoder
  itself stays causal.

TPU-first: decoder layers are grouped ``(G, n)`` and double-scanned
(outer scan over groups carrying one xattn block each), media masks are
built with ``broadcasted_iota``/``cumsum`` — no Python loops or class
surgery (the reference rewires HF modules at runtime via
``extend_instance``, ``src/utils.py:4-10``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Params, Policy, layernorm
from .configs import AKIConfig
from .phi3 import _attention_layer
from ..ops.rope import rope_cos_sin


def init_gated_xattn(key, dim: int, dim_visual: int, num_blocks: int,
                     dim_head: int = 64, heads: int = 8, ff_mult: int = 4,
                     dtype=jnp.float32) -> Params:
    inner = dim_head * heads
    G = num_blocks
    ks = jax.random.split(key, 5)
    s = 0.02

    def w(k, *shape):
        return jax.random.normal(k, shape, dtype) * s

    def ln(d):
        return {"scale": jnp.ones((G, d), dtype), "bias": jnp.zeros((G, d), dtype)}

    return {
        "norm": ln(dim),
        "to_q": w(ks[0], G, dim, inner),
        "to_kv": w(ks[1], G, dim_visual, 2 * inner),
        "to_out": w(ks[2], G, inner, dim),
        "attn_gate": jnp.zeros((G, 1), dtype),
        "ff_ln": ln(dim),
        "ff1": w(ks[3], G, dim, dim * ff_mult),
        "ff2": w(ks[4], G, dim * ff_mult, dim),
        "ff_gate": jnp.zeros((G, 1), dtype),
    }


def gated_xattn_block(
    xp: Params,
    x: jax.Array,              # (B, T_txt, D) text stream
    media: jax.Array,          # (B, T_img, n_lat, D_vis)
    media_locations: jax.Array,  # (B, T_txt) bool
    heads: int = 8,
    dim_head: int = 64,
    only_attend_immediate_media: bool = True,
    use_cached_media: bool = False,
) -> jax.Array:
    b, t_txt, d = x.shape
    t_img, n_lat = media.shape[1], media.shape[2]
    scale = dim_head ** -0.5

    h = layernorm(xp["norm"], x)
    q = (h @ xp["to_q"]).reshape(b, t_txt, heads, dim_head)
    m = media.reshape(b, t_img * n_lat, -1).astype(x.dtype)
    kv = m @ xp["to_kv"]
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, -1, heads, dim_head)
    v = v.reshape(b, -1, heads, dim_head)

    sim = jnp.einsum(
        "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale

    # media-location time mask (helpers.py:263-296)
    media_time = jnp.repeat(jnp.arange(1, t_img + 1), n_lat)      # (T_img*n,)
    if use_cached_media:
        text_time = jnp.broadcast_to(
            jnp.sum(media_locations.astype(jnp.int32), axis=1)[:, None],
            (b, t_txt),
        )
    else:
        text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=1)
    tt = text_time[:, None, :, None]
    mt = media_time[None, None, None, :]
    ok = (tt == mt) if only_attend_immediate_media else (tt >= mt)
    sim = jnp.where(ok, sim, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(sim, axis=-1)
    if only_attend_immediate_media:
        # text with no preceding media attends to nothing (helpers.py:290-296)
        attn = jnp.where((text_time == 0)[:, None, :, None], 0.0, attn)

    out = jnp.einsum(
        "bhij,bjhd->bihd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    out = out.reshape(b, t_txt, heads * dim_head) @ xp["to_out"]
    x = x + out * jnp.tanh(xp["attn_gate"][0].astype(jnp.float32)).astype(x.dtype)

    f = layernorm(xp["ff_ln"], x)
    f = f @ xp["ff1"]
    f = jax.nn.gelu(f.astype(jnp.float32), approximate=True).astype(f.dtype)
    x = x + (f @ xp["ff2"]) * jnp.tanh(
        xp["ff_gate"][0].astype(jnp.float32)
    ).astype(x.dtype)
    return x


def flamingo_decoder_forward(
    params: Params,            # {"phi3": ..., "xattn": ...}
    cfg: AKIConfig,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    media: jax.Array,          # (B, T_img, n_lat, D_lm) perceiver outputs
    media_locations: jax.Array,  # (B, T_txt) bool, True at <image> tokens
    kv_valid: jax.Array | None = None,
    cross_attn_every_n: int = 4,
    policy: Policy = Policy(),
    use_flash: bool | None = None,
    remat: bool = False,
    xattn_heads: int = 8,
    xattn_dim_head: int = 64,
) -> jax.Array:
    """Causal decoder with a gated xattn block before every n-th layer.

    Returns final hidden states (B, T_txt, D).
    """
    from .common import rmsnorm

    pcfg = cfg.phi3
    L, n = pcfg.num_layers, cross_attn_every_n
    assert L % n == 0, "num_layers must be divisible by cross_attn_every_n"
    G = L // n
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"

    x = inputs_embeds.astype(policy.compute_dtype)
    cos, sin = rope_cos_sin(pcfg.rope, positions)
    eps = pcfg.rms_norm_eps

    layers = policy.cast(params["phi3"]["layers"])
    xattn = policy.cast(params["xattn"])
    media = media.astype(policy.compute_dtype)

    # regroup stacked decoder layers to (G, n, ...)
    grouped = jax.tree.map(
        lambda a: a.reshape((G, n) + a.shape[1:]), layers
    )

    def group_body(x, scanned):
        gl, xp = scanned
        x = gated_xattn_block(
            xp, x, media=media, media_locations=media_locations,
            heads=xattn_heads, dim_head=xattn_dim_head,
        )

        def layer_body(x, lp):
            y, _, _ = _attention_layer(
                x, lp, cos, sin, pcfg, None, kv_valid, 0, None, use_flash, eps,
            )
            return y, None

        if remat:
            layer_body = jax.checkpoint(
                layer_body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        x, _ = jax.lax.scan(layer_body, x, gl)
        return x, None

    if remat:
        group_body = jax.checkpoint(group_body)
    x, _ = jax.lax.scan(group_body, x, (grouped, xattn))
    return rmsnorm(policy.cast(params["phi3"]["final_norm"]), x, eps)
