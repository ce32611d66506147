"""KV-cached generation engine: MMA prefill, causal decode.

Encodes the reference's generation contract as an explicit engine design
instead of a monkey-patch (``src/aki_generation.py:36-85`` patches HF so
that after prefill the 4D MMA mask is dropped and positions continue from
the cached length *including* the 144 vision tokens):

- **prefill**: spliced sequence under the full MMA block mask; K/V written
  to a preallocated static-shape cache at slots ``[0, T_full)``; next-token
  logits taken at each sample's last *valid* position.
- **decode**: one query row per step, plain causal over the cache under a
  validity mask; the new token is written at slot ``lengths[i]`` and gets
  RoPE position ``lengths[i]`` — for unpadded rows this is exactly the
  reference's ``position_ids = cached_len`` (``aki_generation.py:77-84``);
  for right-padded batched rows it is the positionally-correct
  generalization (the reference only ever decodes B=1).

The whole decode loop is one ``lax.scan`` under jit — static shapes, no
host round-trips per token.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..models.aki import embed_text, encode_vision, lm_logits
from ..models.common import Policy
from ..models.configs import AKIConfig
from ..models.fusion import splice_vision_tokens
from ..models.phi3 import KVCache, KVCacheQ, phi3_forward
from .sampling import SamplingConfig, sample


def padded_head_dim(params: dict, cfg: AKIConfig) -> int | None:
    """dp when ``params`` carry the padded-head serving layout
    (``quantize_params_padded``), else None — detected from wq's columns."""
    w = params["phi3"]["layers"]["wq"]
    cols = w.q.shape[-1] if hasattr(w, "q") else w.shape[-1]
    dp = cols // cfg.phi3.num_heads
    return dp if dp != cfg.phi3.head_dim else None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GenState:
    cache: KVCache
    kv_valid: jax.Array     # (B, max_len) 0/1 over cache slots
    lengths: jax.Array      # (B,) number of live tokens (== next write slot)
    last_logits: jax.Array  # (B, V)


def prefill(
    params: dict,
    cfg: AKIConfig,
    input_ids: jax.Array,
    images: jax.Array | None,
    attn_valid: jax.Array,
    max_len: int,
    policy: Policy = Policy(),
    use_flash: bool | None = None,
    order: str = "image_first",
    vision_tokens: jax.Array | None = None,
    kv_int8: bool = False,
    tp_mesh=None,
    attn_mode: str | None = None,
    slot_state: GenState | None = None,
    slots: jax.Array | None = None,
) -> GenState:
    """Run the prompt through the model, filling the KV cache.

    ``slot_state``/``slots``: serving-admission mode — instead of
    allocating a fresh batch-sized cache, write each row's K/V straight
    into row ``slots[r]`` of the (wider, ideally donated) ``slot_state``
    cache and scatter the bookkeeping (kv_valid/lengths/last_logits)
    the same way; returns the merged full-width GenState. Skips the
    separate insert scatter (~21.5 ms per bs16 admission at AKI-4B) and
    the temp state's HBM footprint (exp/admit_split.py). ``slots`` ==
    cache width drops the row (padded admissions).

    ``kv_int8=True`` stores the cache as per-(token, head) int8 — halves
    the decode cache-read bytes; decode then runs the fused Pallas kernel
    (``ops/decode_attention.py``) that never dequantizes into HBM.

    ``attn_mode`` selects the reference's three ablation modes
    (README.md:81-87 table; one kernel for all three, ``ops/masks.py``):
    ``"mma"`` (default, == ``order="image_first"`` with the MMA block),
    ``"dot"`` (text-before-image ordering, plain causal — vlm.py:461
    note), ``"causal"`` (image-first splice, MMA block zeroed). When
    given, it overrides ``order``.
    """
    if attn_mode is not None:
        if attn_mode not in ("mma", "dot", "causal"):
            raise ValueError(f"attn_mode {attn_mode!r}")
        order = "text_first" if attn_mode == "dot" else "image_first"
    b, t_txt = input_ids.shape
    head_pad = padded_head_dim(params, cfg)
    if head_pad is not None and not kv_int8:
        raise ValueError(
            "padded-head serving weights (quantize_params_padded) require "
            "kv_int8=True"
        )
    if vision_tokens is None:
        vision_tokens = encode_vision(params, cfg, images, policy,
                                      tp_mesh=tp_mesh)
    text_embeds = embed_text(params, cfg, input_ids, policy)
    sp = splice_vision_tokens(
        text_embeds, vision_tokens, input_ids, attn_valid,
        cfg.media_token_id, cfg.assistant_token_id, order=order,
    )
    if attn_mode == "causal":
        # causal ablation: same image-first splice, MMA block zeroed
        from ..ops.masks import causal_spec

        sp = dataclasses.replace(sp, spec=causal_spec(b))
    t_full = sp.embeds.shape[1]
    assert max_len >= t_full, "cache shorter than prompt"

    if slot_state is not None:
        assert slots is not None, "slot_state requires slots"
        cache = slot_state.cache
    elif kv_int8:
        cache = KVCacheQ.create(cfg.phi3, b, max_len, head_pad=head_pad)
    else:
        cache = KVCache.create(cfg.phi3, b, max_len, dtype=policy.compute_dtype)
    kv_valid = jnp.zeros((b, max_len), jnp.int32)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, sp.attn_valid, (0, 0))

    hidden, cache = phi3_forward(
        params["phi3"], cfg.phi3, sp.embeds, sp.positions,
        spec=sp.spec, kv_valid=kv_valid,
        cache=cache, cache_index=jnp.zeros((b,), jnp.int32),
        policy=policy, use_flash=use_flash, tp_mesh=tp_mesh,
        cache_slots=slots if slot_state is not None else None,
    )
    # head only on each sample's last valid position — full-sequence logits
    # at prefill are (B, T, 32k) of dead weight (HBM + 5% of the FLOPs)
    lengths = jnp.sum(sp.attn_valid, axis=1).astype(jnp.int32)
    last_idx = jnp.clip(lengths - 1, 0, t_full - 1)
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1
    )
    last_logits = lm_logits(params, cfg, last_hidden, policy)[:, 0]
    if slot_state is not None:
        # merge the bookkeeping into the slot rows (drop mode: padded
        # admission rows carry slots == cache width)
        return GenState(
            cache=cache,
            kv_valid=slot_state.kv_valid.at[slots].set(
                kv_valid, mode="drop"),
            lengths=slot_state.lengths.at[slots].set(lengths, mode="drop"),
            last_logits=slot_state.last_logits.at[slots].set(
                last_logits.astype(jnp.float32), mode="drop"),
        )
    return GenState(
        cache=cache, kv_valid=kv_valid, lengths=lengths,
        last_logits=last_logits.astype(jnp.float32),
    )


def decode_step(
    params: dict,
    cfg: AKIConfig,
    state: GenState,
    token_ids: jax.Array,
    policy: Policy = Policy(),
    live_width: int | None = None,
) -> GenState:
    """Advance one token. ``token_ids``: (B,) ids chosen from last_logits.

    ``live_width``: static hint that only the first ``live_width`` batch
    rows are live (serving tail compaction) — the int8-KV XLA decode then
    reads only that batch prefix of the cache (the dominant decode cost);
    dead rows' attention comes back zero and their bookkeeping is frozen
    by the caller. Other attention paths ignore the hint (full-width
    correct, just not faster)."""
    b = token_ids.shape[0]
    embeds = embed_text(params, cfg, token_ids[:, None], policy)
    positions = state.lengths[:, None]

    # mark the new slot valid before attention (a token attends to itself)
    kv_valid = jax.vmap(
        lambda row, i: jax.lax.dynamic_update_slice(row, jnp.ones((1,), row.dtype), (i,))
    )(state.kv_valid, state.lengths)

    hidden, cache = phi3_forward(
        params["phi3"], cfg.phi3, embeds, positions,
        spec=None, kv_valid=kv_valid, q_offset=state.lengths,
        cache=state.cache, cache_index=state.lengths,
        policy=policy, live_width=live_width,
    )
    logits = lm_logits(params, cfg, hidden, policy)[:, 0]
    return GenState(
        cache=cache, kv_valid=kv_valid, lengths=state.lengths + 1,
        last_logits=logits.astype(jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "max_len", "sampling", "policy", "use_flash",
        "order", "kv_int8", "tp_mesh", "attn_mode",
    ),
)
def generate(
    params: dict,
    cfg: AKIConfig,
    input_ids: jax.Array,
    images: jax.Array | None,
    attn_valid: jax.Array,
    max_new_tokens: int,
    max_len: int,
    eos_id: int | None = None,
    sampling: SamplingConfig = SamplingConfig(),
    rng: jax.Array | None = None,
    policy: Policy = Policy(),
    use_flash: bool | None = None,
    order: str = "image_first",
    kv_int8: bool = False,
    tp_mesh=None,
    attn_mode: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Batched generation.

    ``attn_mode`` ("mma" | "dot" | "causal") selects the reference's
    ablation modes at prefill (see :func:`prefill`); decode is plain
    causal over the cache in all three.

    Returns:
        (tokens (B, max_new_tokens) int32 — eos/pad-filled after stop,
         num_generated (B,)).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    eos = -1 if eos_id is None else eos_id

    state = prefill(
        params, cfg, input_ids, images, attn_valid, max_len,
        policy=policy, use_flash=use_flash, order=order, kv_int8=kv_int8,
        tp_mesh=tp_mesh, attn_mode=attn_mode,
    )
    b = input_ids.shape[0]

    def step(carry, i):
        state, done, key = carry
        key, sub = jax.random.split(key)
        tok = sample(state.last_logits, sampling, sub)
        tok = jnp.where(done, cfg.pad_token_id, tok).astype(jnp.int32)
        new_done = done | (tok == eos)
        new_state = decode_step(params, cfg, state, tok, policy=policy)
        return (new_state, new_done, key), tok

    # Done rows keep decoding pad tokens into their own cache; their outputs
    # are masked out of the return value, so this is correct (and keeps the
    # scan shape-static, which is what the TPU wants).
    done0 = jnp.zeros((b,), bool)
    (state, done, _), tokens = jax.lax.scan(
        step, (state, done0, rng), jnp.arange(max_new_tokens)
    )
    tokens = tokens.T  # (B, max_new_tokens)
    valid = jnp.cumsum((tokens == eos).astype(jnp.int32), axis=1) == 0
    num = jnp.sum(valid, axis=1) + jnp.any(tokens == eos, axis=1).astype(jnp.int32)
    return tokens, jnp.minimum(num, max_new_tokens)
