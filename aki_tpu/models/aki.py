"""The AKI model: SigLIP -> Perceiver -> splice -> Phi-3 with MMA attention.

Composition mirrors the reference 4-part VLM decomposition
(``src/vlm.py:12-24``) and the AKI concrete class (``src/aki.py:9-134``):

1. frozen SigLIP vision encoder (``stop_gradient`` — the functional analogue
   of ``set_trainable``'s ``requires_grad_(False)``, ``src/aki.py:52-57``);
2. Perceiver resampler to 144 vision tokens;
3. fusion by splicing tokens into the language stream at the ``<image>``
   position (static-shape gather, ``models/fusion.py``);
4. Phi-3 decoder under the MMA block mask; loss is computed directly on the
   spliced labels like the reference's loss path, which skips logit
   re-collapse (``src/aki.py:113-134``).

Everything here is pure-functional and jit/pjit-safe.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .common import Params, Policy
from .configs import AKIConfig
from .embeddings import decoupled_logits, decoupled_lookup, init_decoupled
from .fusion import SplicedBatch, splice_vision_tokens
from .perceiver import init_perceiver, perceiver_forward
from .phi3 import KVCache, init_phi3, phi3_forward
from .siglip import init_siglip, siglip_forward


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AKIOutput:
    logits: jax.Array            # (B, T_full, output_vocab) over spliced seq
    loss: jax.Array | None       # scalar mean CE over non-ignored labels
    spliced: SplicedBatch
    cache: KVCache | None = None
    aux: jax.Array | None = None  # MoE load-balance loss (Phi3Config.moe)


def init_aki(key, cfg: AKIConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "siglip": init_siglip(k1, cfg.siglip, dtype),
        "perceiver": init_perceiver(k2, cfg.perceiver, dtype),
        "phi3": init_phi3(k3, cfg.phi3, dtype),
        **init_decoupled(
            k4, cfg.phi3.hidden_size, cfg.num_extra_tokens, cfg.phi3.vocab_size,
            cfg.phi3.initializer_range, dtype,
        ),
    }


def encode_vision(
    params: Params, cfg: AKIConfig, images: jax.Array,
    policy: Policy = Policy(),
    tp_mesh=None,
    remat: bool = False,
) -> jax.Array:
    """Pixels -> vision tokens. (B, H, W, C) -> (B, n_vis, D_lm), or
    (B, N_img, H, W, C) -> (B, N_img, n_vis, D_lm) for interleaved inputs.

    The encoder runs under ``stop_gradient`` (reference ``torch.no_grad``
    at ``src/vlm.py:199``); the perceiver stays differentiable.
    """
    multi = images.ndim == 5
    if multi:
        b, n = images.shape[:2]
        images = images.reshape((b * n,) + images.shape[2:])
    feats = siglip_forward(params["siglip"], cfg.siglip, images, policy,
                           tp_mesh=tp_mesh)
    feats = jax.lax.stop_gradient(feats)
    toks = perceiver_forward(params["perceiver"], cfg.perceiver, feats, policy,
                             remat=remat)
    if multi:
        toks = toks.reshape((b, n) + toks.shape[1:])
    return toks


def embed_text(params: Params, cfg: AKIConfig, ids: jax.Array,
               policy: Policy = Policy()) -> jax.Array:
    base = params["phi3"]["embed"]["table"].astype(policy.compute_dtype)
    extra = params["extra_embed"]["table"].astype(policy.compute_dtype)
    return decoupled_lookup(base, extra, ids, cfg.initial_tokenizer_len)


def lm_logits(params: Params, cfg: AKIConfig, hidden: jax.Array,
              policy: Policy = Policy()) -> jax.Array:
    from .quant import is_quantized

    head = params["lm_head"]["w"]
    if not is_quantized(head):  # quantized heads pass through as-is
        head = head.astype(policy.compute_dtype)
    extra = params["extra_head"]["w"].astype(policy.compute_dtype)
    return decoupled_logits(
        hidden, head, extra, cfg.initial_tokenizer_len,
        head_b=params["lm_head"].get("b"),
        extra_b=params["extra_head"].get("b"),
    )


def next_token_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean shifted CE over labels != -100, fp32 (HF CausalLM loss)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok = jnp.take_along_axis(
        logp, safe[..., None], axis=-1, mode="clip"
    )[..., 0]
    total = jnp.sum(jnp.where(valid, -tok, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def aki_forward(
    params: Params,
    cfg: AKIConfig,
    input_ids: jax.Array,
    images: jax.Array | None,
    attn_valid: jax.Array,
    labels: jax.Array | None = None,
    policy: Policy = Policy(),
    remat: bool = False,
    use_flash: bool | None = None,
    order: str = "image_first",
    vision_tokens: jax.Array | None = None,
    tp_mesh=None,
    sp_mesh=None,
    pp_mesh=None,
    pp_microbatches: int | None = None,
    ep_mesh=None,
) -> AKIOutput:
    """Training/eval forward.

    Args:
        input_ids: (B, T_txt) with one ``<image>`` token per row.
        images: (B, H, W, C) pixels (or None with ``vision_tokens`` given).
        attn_valid: (B, T_txt) 0/1 right-padded text validity.
        labels: optional (B, T_txt) with -100 on prompt/pad.
        order: "image_first" (MMA) | "text_first" (DOT ablation).
    """
    if vision_tokens is None:
        vision_tokens = encode_vision(params, cfg, images, policy,
                                      tp_mesh=tp_mesh, remat=remat)

    text_embeds = embed_text(params, cfg, input_ids, policy)
    if vision_tokens.ndim == 4:
        # interleaved multi-image (B, N_img, n_vis, D)
        from .fusion import splice_vision_tokens_multi

        sp = splice_vision_tokens_multi(
            text_embeds, vision_tokens, input_ids, attn_valid,
            cfg.media_token_id, cfg.assistant_token_id, labels=labels,
        )
    else:
        sp = splice_vision_tokens(
            text_embeds, vision_tokens, input_ids, attn_valid,
            cfg.media_token_id, cfg.assistant_token_id, labels=labels,
            order=order,
        )
    if pp_mesh is not None:
        from ..parallel.pipeline import phi3_forward_pp

        hidden, aux = phi3_forward_pp(
            params["phi3"], cfg.phi3, sp.embeds, sp.positions,
            spec=sp.spec, kv_valid=sp.attn_valid, mesh=pp_mesh,
            num_microbatches=pp_microbatches, policy=policy, remat=remat,
            use_flash=use_flash,
        )
        # MoE stages flow their Switch aux through the pipe payload
        aux = aux if cfg.phi3.moe is not None else None
    else:
        # MoE decoders surface the Switch aux loss so the trainer can
        # weight it in — without this the router gets no balance pressure
        moe = cfg.phi3.moe is not None
        if moe:
            hidden, _, aux = phi3_forward(
                params["phi3"], cfg.phi3, sp.embeds, sp.positions,
                spec=sp.spec, kv_valid=sp.attn_valid,
                policy=policy, remat=remat, use_flash=use_flash,
                tp_mesh=tp_mesh, sp_mesh=sp_mesh, ep_mesh=ep_mesh,
                with_aux=True,
            )
        else:
            hidden, _ = phi3_forward(
                params["phi3"], cfg.phi3, sp.embeds, sp.positions,
                spec=sp.spec, kv_valid=sp.attn_valid,
                policy=policy, remat=remat, use_flash=use_flash,
                tp_mesh=tp_mesh, sp_mesh=sp_mesh,
            )
            aux = None
    logits = lm_logits(params, cfg, hidden, policy)
    loss = next_token_loss(logits, sp.labels) if labels is not None else None
    return AKIOutput(logits=logits, loss=loss, spliced=sp, aux=aux)
