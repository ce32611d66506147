"""Phi-3-family decoder, TPU-first.

Geometry and numerics match HF ``Phi3ForCausalLM`` (the reference's language
backbone, ``src/factory.py:110-115``): RMSNorm, fused-equivalent QKV (stored
split for clean tensor-parallel sharding), neox RoPE with optional LongRoPE
factors, SiLU-gated MLP, residual adds in fp32 params / bf16 compute.

TPU-first choices:

- layers are **stacked** along a leading axis and executed with
  ``jax.lax.scan`` — one compiled layer body regardless of depth, fast
  compiles, natural ``jax.checkpoint`` boundary per layer;
- attention masking is the :class:`~aki_tpu.ops.masks.MMASpec` contract —
  never a dense (T, T) tensor in HBM (Pallas flash kernel on TPU);
- the KV cache is a preallocated static-shape buffer written with per-sample
  dynamic slices; decode attends over the full buffer under a validity mask
  (the engine's analogue of the reference generation patch,
  ``src/aki_generation.py:36-85``).

The embedding table and LM head are *not* here — AKI decouples them
(``models/embeddings.py``); this module consumes ``inputs_embeds`` like the
reference's spliced forward (``src/aki.py:125-130``).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from ..ops.attention import dense_attention
from ..ops.masks import MMASpec
from ..ops.rope import apply_rope, rope_cos_sin
from .quant import is_quantized, mm, norm_quant_acts, silu_mul_quant_acts
from .common import Params, Policy, rmsnorm
from .configs import Phi3Config


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-layer stacked KV cache: (L, B, S, H_kv, D_head)."""

    k: jax.Array
    v: jax.Array

    @staticmethod
    def create(cfg: Phi3Config, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCacheQ:
    """Int8 KV cache in the flat layout (L, B, S, H_kv*D) — all heads of
    a token are one contiguous row, which is what lets the decode kernel
    do one block-diagonal MXU dot for all heads
    (ops/decode_attention.py). Per-(token, head) scales are **token-major**
    (L, B, S, H_kv) f32, so the per-step decode write of one token's
    scales is a contiguous row scatter exactly like the int8 rows —
    head-major (L, B, Hkv, S) made it a strided column write XLA could
    not keep in place (~3 ms/step of copies at AKI-4B).

    Phi-3-mini is MHA (32 KV heads x 96 dims — ~196 KB/token in int8), so
    cache reads rival the weight reads at decode; int8 (nearly) halves
    those bytes and the fused kernel never materializes a dequantized
    copy.
    """

    k: jax.Array   # int8 (L, B, S, Hkv*D)
    ks: jax.Array  # f32  (L, B, S, Hkv)
    v: jax.Array   # int8
    vs: jax.Array  # f32

    @staticmethod
    def create(cfg: Phi3Config, batch: int, max_len: int,
               head_pad: int | None = None):
        """``head_pad``: per-head row width for the padded-head serving
        layout (quantize_params_padded) — int8 rows at 128-aligned heads
        are still 33% smaller than unpadded bf16."""
        d = head_pad or cfg.head_dim
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads * d)
        sshape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads)
        return KVCacheQ(
            k=jnp.zeros(shape, jnp.int8), ks=jnp.ones(sshape, jnp.float32),
            v=jnp.zeros(shape, jnp.int8), vs=jnp.ones(sshape, jnp.float32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def _pad_rope_tables(cos: jax.Array, sin: jax.Array, d: int, dp: int):
    """(… , d) rope tables -> (…, dp) for the padded-head layout: each
    rotary half pads independently so rotate-half at dp/2 maps real lanes
    onto real lanes (pad lanes carry zeros in the activations, so the pad
    table values are irrelevant — zeros keep them exactly zero)."""
    half, ph = d // 2, dp // 2

    def pad1(tab):
        z = jnp.zeros(tab.shape[:-1] + (ph - half,), tab.dtype)
        return jnp.concatenate([tab[..., :half], z, tab[..., half:], z], -1)

    return pad1(cos), pad1(sin)


def init_phi3(key, cfg: Phi3Config, dtype=jnp.float32) -> Params:
    """Stacked-layer params. Kernels are (in, out)."""
    d, nh, nkv, dh = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inter, L = cfg.intermediate_size, cfg.num_layers
    ks = jax.random.split(key, 8)
    s = cfg.initializer_range

    def w(k, *shape):
        return jax.random.normal(k, shape, dtype) * s

    if cfg.moe is not None:
        # routed expert MLP (framework MoE mode; reference is dense) —
        # expert weights stacked (L, E, ...) so the layer scan + the
        # "expert" sharding axis both apply
        e, mi = cfg.moe.num_experts, cfg.moe.intermediate_size
        mks = jax.random.split(ks[5], 4)
        mlp = {
            "moe": {
                "router": {"w": w(mks[0], L, d, e)},
                "w_gate": w(mks[1], L, e, d, mi),
                "w_up": w(mks[2], L, e, d, mi),
                "w_down": w(mks[3], L, e, mi, d),
            }
        }
    else:
        mlp = {
            "w_gate": w(ks[5], L, d, inter),
            "w_up": w(ks[6], L, d, inter),
            "w_down": w(ks[7], L, inter, d),
        }

    return {
        "embed": {"table": w(ks[0], cfg.vocab_size, d)},
        "layers": {
            "ln1": {"scale": jnp.ones((L, d), dtype)},
            "wq": w(ks[1], L, d, nh * dh),
            "wk": w(ks[2], L, d, nkv * dh),
            "wv": w(ks[3], L, d, nkv * dh),
            "wo": w(ks[4], L, nh * dh, d),
            "ln2": {"scale": jnp.ones((L, d), dtype)},
            **mlp,
        },
        "final_norm": {"scale": jnp.ones((d,), dtype)},
    }


def _scatter_cache(cache: jax.Array, new: jax.Array, layer: jax.Array,
                   positions: jax.Array) -> jax.Array:
    """Scatter (B, T, H, D) entries into the stacked (L, B, S, H, D) cache at
    ``[layer, b, positions[b, t]]``.

    A scatter (not a full-buffer dynamic-slice rewrite): when the cache
    buffer is aliased through the scan carry / donated jit argument, XLA
    updates in place — decode writes B*T rows instead of copying the cache.
    """
    b = new.shape[0]
    bidx = jnp.arange(b)[:, None]
    return cache.at[layer, bidx, positions].set(
        new.astype(cache.dtype), mode="drop"
    )


def _scatter_flat(cache: jax.Array, new: jax.Array, layer: jax.Array,
                  positions: jax.Array) -> jax.Array:
    """Scatter (B, T, F) rows into the flat (L, B, S, F) cache at
    ``[layer, b, positions[b, t]]``."""
    b = new.shape[0]
    bidx = jnp.arange(b)[:, None]
    return cache.at[layer, bidx, positions].set(
        new.astype(cache.dtype), mode="drop"
    )


def _store_prefill(cache: jax.Array, new: jax.Array, layer,
                   cache_slots: jax.Array | None) -> jax.Array:
    """Write one layer's prefill block into the stacked cache.

    ``cache_slots`` None: the cache belongs to the prefill batch itself
    (cache rows == batch rows) — one contiguous dynamic-update-slice at
    row 0 (the offline/generate path). Otherwise row r scatters into slot
    ``cache_slots[r]`` of a WIDER serving cache (``mode="drop"``: index ==
    cache width drops padded rows) — the admission prefill then writes
    straight into the donated slot cache, skipping the temp-state insert
    scatter (~21.5 ms per bs16 admission at AKI-4B, exp/admit_split.py)
    and its 16-row temp cache HBM footprint."""
    if cache_slots is None:
        idx = (layer,) + (0,) * (cache.ndim - 1)
        return jax.lax.dynamic_update_slice(
            cache, new[None].astype(cache.dtype), idx
        )
    t = new.shape[1]
    return cache.at[layer, cache_slots, :t].set(
        new.astype(cache.dtype), mode="drop"
    )


def _attention_layer(
    x: jax.Array,
    lp: Params,
    cos: jax.Array,
    sin: jax.Array,
    cfg: Phi3Config,
    spec: MMASpec | None,
    kv_valid: jax.Array | None,
    q_offset,
    cache_kv: tuple | None,   # ("bf16", ck, cv, li, wpos) or
                              # ("q8", k8, ks, v8, vs, li, wpos)
    use_flash: bool,
    eps: float,
    tp_mesh=None,
    sp_mesh=None,
    ep_mesh=None,
    live_width: int | None = None,
    cache_slots: jax.Array | None = None,
):
    b, t, d = x.shape
    nh, nkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    # fused norm+quantize ahead of the int8 qkv dots when serving W8A8
    # (one HBM pass instead of XLA's norm/amax/quantize chain); plain
    # rmsnorm otherwise — norm_quant_acts decides from the probe kernel
    h = norm_quant_acts("rms", lp["ln1"], x, eps,
                        probe=lp.get("wqkv", lp.get("wq")))

    wq = lp.get("wq")
    wq_cols = (wq.q.shape[-1] if hasattr(wq, "q") else wq.shape[-1]) \
        if wq is not None else nh * dh
    dp = wq_cols // nh
    if dp != dh:
        # FLAT padded-head serving layout (quantize_params_padded): each
        # head owns dp (128-aligned) lanes straight out of the projection
        # matmuls — no pad/transpose relayouts around the attention kernel
        # (measured ~3 ms/layer at AKI-4B prefill), and the int8 KV cache
        # stores 128-aligned flat rows the decode kernel reads natively.
        if cache_kv is None or cache_kv[0] != "q8" or nkv != nh:
            raise ValueError(
                "padded-head (flat) weights require the int8-KV serving "
                "path (kv_int8=True / KVCacheQ cache) and MHA (nkv == nh)"
            )
        from ..ops import decode_attention as da

        _, ck8, cks, cv8, cvs, li, wpos = cache_kv
        q4 = mm(h, lp["wq"]).reshape(b, t, nh, dp)
        k4 = mm(h, lp["wk"]).reshape(b, t, nkv, dp)
        v4 = mm(h, lp["wv"]).reshape(b, t, nkv, dp)
        cos_p, sin_p = _pad_rope_tables(cos, sin, dh, dp)
        q4 = apply_rope(q4, cos_p, sin_p)
        k4 = apply_rope(k4, cos_p, sin_p)
        k8, ksc = da.quantize_kv_flat(k4)
        v8, vsc = da.quantize_kv_flat(v4)
        if t == 1:
            ck8 = _scatter_flat(ck8, k8, li, wpos)
            cks = _scatter_flat(cks, ksc, li, wpos)
            cv8 = _scatter_flat(cv8, v8, li, wpos)
            cvs = _scatter_flat(cvs, vsc, li, wpos)
            lengths = jnp.broadcast_to(
                jnp.asarray(q_offset, jnp.int32), (b,)
            ) + 1
            attn4 = da.decode_attention_flat_xla(
                q4, ck8, cks, cv8, cvs, lengths, li, scale=dh ** -0.5,
                live_width=live_width,
            )
            attn_flat = attn4.reshape(b, 1, nh * dp)
        else:
            ck8 = _store_prefill(ck8, k8, li, cache_slots)
            cks = _store_prefill(cks, ksc, li, cache_slots)
            cv8 = _store_prefill(cv8, v8, li, cache_slots)
            cvs = _store_prefill(cvs, vsc, li, cache_slots)
            # prefill: the flat path is always quantized serving — use
            # the XLA bf16-prob MMA path (pad lanes are zeros, so dots
            # over dp lanes equal dots over dh; pass the real-dh scale)
            from ..ops.attention import decoder_attention_xla

            attn4 = decoder_attention_xla(
                q4, k4, v4, spec=spec,
                kv_valid=kv_valid[:, :t] if kv_valid is not None else None,
                q_offset=q_offset, scale=dh ** -0.5,
            )
            attn_flat = attn4.reshape(b, t, nh * dp)
        x = x + mm(attn_flat, lp["wo"])
        h2 = norm_quant_acts("rms", lp["ln2"], x, eps, probe=lp["w_gate"])
        gate = mm(h2, lp["w_gate"])
        up = mm(h2, lp["w_up"])
        mlp = mm(silu_mul_quant_acts(gate, up, probe=lp["w_down"]),
                 lp["w_down"])
        return x + mlp, (ck8, cks, cv8, cvs), jnp.zeros((), jnp.float32)

    if "wqkv" in lp:
        # serving-time fused QKV (quantize_params fuse=True): one
        # activation-quantize + one wide MXU dot
        qkv = mm(h, lp["wqkv"])
        q = qkv[..., : nh * dh].reshape(b, t, nh, dh)
        k = qkv[..., nh * dh: (nh + nkv) * dh].reshape(b, t, nkv, dh)
        v = qkv[..., (nh + nkv) * dh:].reshape(b, t, nkv, dh)
    else:
        q = mm(h, lp["wq"]).reshape(b, t, nh, dh)
        k = mm(h, lp["wk"]).reshape(b, t, nkv, dh)
        v = mm(h, lp["wv"]).reshape(b, t, nkv, dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    attn = None
    kv_valid_att = kv_valid
    if cache_kv is not None and cache_kv[0] == "q8":
        from ..ops import decode_attention as da

        _, ck8, cks, cv8, cvs, li, wpos = cache_kv
        k8, ksc = da.quantize_kv_flat(k)
        v8, vsc = da.quantize_kv_flat(v)
        if t == 1:
            ck8 = _scatter_flat(ck8, k8, li, wpos)
            cks = _scatter_flat(cks, ksc, li, wpos)
            cv8 = _scatter_flat(cv8, v8, li, wpos)
            cvs = _scatter_flat(cvs, vsc, li, wpos)
            # decode over the int8 cache: "xla" = int8 dot_general straight
            # against the stacked buffers (layer slice fuses into the dot);
            # "pallas" = the fused kernel indexing [li] in its BlockSpec
            lengths = jnp.broadcast_to(
                jnp.asarray(q_offset, jnp.int32), (b,)
            ) + 1
            if da.DECODE_IMPL == "xla":
                # live_width: tail-compaction hint — only the first
                # live_width batch rows are read from the cache (dead
                # rows return zeros; the Pallas path ignores the hint and
                # stays full-width correct)
                attn = da.decode_attention_flat_xla(
                    q, ck8, cks, cv8, cvs, lengths, li,
                    live_width=live_width,
                )
            else:
                attn = da.decode_attention_flat(
                    q, ck8, cks, cv8, cvs, lengths, li,
                )
        else:
            # prefill: quantize+store the whole block (contiguous DUS, or
            # slot scatter under cache_slots); attention runs on the
            # local bf16 K/V — no need to read the quantized copy back
            ck8 = _store_prefill(ck8, k8, li, cache_slots)
            cks = _store_prefill(cks, ksc, li, cache_slots)
            cv8 = _store_prefill(cv8, v8, li, cache_slots)
            cvs = _store_prefill(cvs, vsc, li, cache_slots)
            k_att, v_att = k, v
            kv_valid_att = kv_valid[:, :t] if kv_valid is not None else None
        new_cache = (ck8, cks, cv8, cvs)
    elif cache_kv is not None:
        _, ck, cv, li, wpos = cache_kv
        if t == 1:
            # decode: scatter-write B rows (in-place on aliased buffers)
            ck = _scatter_cache(ck, k, li, wpos)
            cv = _scatter_cache(cv, v, li, wpos)
        else:
            # prefill: the engine writes the whole block at slot 0 — one
            # contiguous dynamic-update-slice per layer (or a slot
            # scatter into a wider serving cache under cache_slots)
            ck = _store_prefill(ck, k, li, cache_slots)
            cv = _store_prefill(cv, v, li, cache_slots)
        new_cache = (ck, cv)
        if t > 1 and cache_slots is not None:
            # slot-scatter prefill: the cache is WIDER than the batch —
            # attend over the local K/V block like the q8 path (the cache
            # is write-only here)
            k_att, v_att = k, v
            kv_valid_att = kv_valid[:, :t] if kv_valid is not None else None
        else:
            k_att = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
            v_att = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
            k_att, v_att = k_att.astype(q.dtype), v_att.astype(q.dtype)
    else:
        k_att, v_att = k, v

    if attn is None:
        if sp_mesh is not None:
            # sequence-parallel training: q/k/v sharded along T. Default
            # is the ring (K/V stay sharded — per-device KV is O(T/seq),
            # the long-context design); ops/ring_attention.py:SP_IMPL
            # toggles back to the all-gather shard_map.
            from ..ops import ring_attention
            from ..ops.flash_mma import flash_mma_attention_sp

            sp_attn = (ring_attention.ring_mma_attention_sp
                       if ring_attention.SP_IMPL == "ring"
                       else flash_mma_attention_sp)
            attn = sp_attn(
                q, k_att, v_att, mesh=sp_mesh, spec=spec,
                kv_valid=kv_valid_att, q_offset=q_offset,
            )
        elif use_flash and tp_mesh is not None:
            # tensor-parallel serving: shard the kernel over heads with
            # shard_map (a bare pallas_call under pjit would replicate)
            from ..ops.flash_mma import flash_mma_attention_tp

            attn = flash_mma_attention_tp(
                q, k_att, v_att, mesh=tp_mesh, spec=spec,
                kv_valid=kv_valid_att, q_offset=q_offset,
            )
        elif use_flash and t > 1 and is_quantized(
                lp.get("wqkv", lp.get("wq"))):
            # SERVING prefill fast path (detected via the quantized
            # weights, like the vision tower): plain-XLA bf16-prob MMA
            # attention beats the DMA-ceiling-bound flash kernel at
            # decoder prefill shapes — bs48 7.35 vs 12.52 ms/layer
            # (exp/prefill_attn_ab.py). Training keeps flash's
            # O(1)-residual vjp; decode (t == 1) rides the int8-KV path.
            from ..ops.attention import decoder_attention_xla

            attn = decoder_attention_xla(
                q, k_att, v_att, spec=spec, kv_valid=kv_valid_att,
                q_offset=q_offset,
            )
        elif use_flash:
            from ..ops.flash_mma import flash_mma_attention

            attn = flash_mma_attention(
                q, k_att, v_att, spec=spec, kv_valid=kv_valid_att,
                q_offset=q_offset,
            )
        else:
            attn = dense_attention(
                q, k_att, v_att, spec=spec, kv_valid=kv_valid_att,
                q_offset=q_offset,
            )
    out = mm(attn.reshape(b, t, nh * dh), lp["wo"])
    x = x + out

    aux = jnp.zeros((), jnp.float32)
    if "moe" in lp:
        from .moe import moe_mlp

        h2 = rmsnorm(lp["ln2"], x, eps)
        mlp, aux = moe_mlp(lp["moe"], h2, cfg.moe, mesh=ep_mesh)
    elif "w_gateup" in lp:
        h2 = norm_quant_acts("rms", lp["ln2"], x, eps, probe=lp["w_gateup"])
        gu = mm(h2, lp["w_gateup"])
        inter = gu.shape[-1] // 2
        gate, up = gu[..., :inter], gu[..., inter:]
        mlp = mm(silu_mul_quant_acts(gate, up, probe=lp["w_down"]),
                 lp["w_down"])
    else:
        h2 = norm_quant_acts("rms", lp["ln2"], x, eps, probe=lp["w_gate"])
        gate = mm(h2, lp["w_gate"])
        up = mm(h2, lp["w_up"])
        mlp = mm(silu_mul_quant_acts(gate, up, probe=lp["w_down"]),
                 lp["w_down"])
    return x + mlp, new_cache, aux


def _remat_policy():
    """Per-layer checkpoint policy for the decoder stack.

    ``AKI_REMAT_POLICY``:

    - ``dots`` (default): ``dots_with_no_batch_dims_saveable`` — the
      fastest backward (nothing big recomputed).
    - ``dots_nowide``: same, EXCEPT dot outputs whose rhs-free size
      exceeds 4096 lanes — i.e. the wide MLP gate/up projections
      ((B, T, inter=8192) each). Saving those two residuals costs ~1 GB
      at AKI-4B bs-12 depth-4 (the two largest buffers in the round-5
      OOM dump); recomputing the two wide dots in the backward is ~7%
      extra decoder FLOPs. The memory/time knob for batch- or
      depth-bound training geometries.
    """
    dots = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if os.environ.get("AKI_REMAT_POLICY", "dots") != "dots_nowide":
        return dots

    def policy(prim, *args, **params):
        if not dots(prim, *args, **params):
            return False
        if prim is jax.lax.dot_general_p:
            (_, rhs_c), (_, rhs_b) = params["dimension_numbers"]
            rhs_free = 1
            for i, d in enumerate(args[1].shape):
                if i not in rhs_c and i not in rhs_b:
                    rhs_free *= d
            return rhs_free <= 4096
        return True

    return policy


def phi3_forward(
    params: Params,
    cfg: Phi3Config,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    spec: MMASpec | None = None,
    kv_valid: jax.Array | None = None,
    q_offset: jax.Array | int = 0,
    cache: KVCache | None = None,
    cache_index: jax.Array | None = None,
    policy: Policy = Policy(),
    remat: bool = False,
    use_flash: bool | None = None,
    tp_mesh=None,
    sp_mesh=None,
    ep_mesh=None,
    with_aux: bool = False,
    live_width: int | None = None,
    cache_slots: jax.Array | None = None,
) -> tuple[jax.Array, KVCache | None]:
    """Run the decoder stack over ``inputs_embeds``.

    Args:
        inputs_embeds: (B, T, D) already-spliced embeddings.
        positions: (B, T) absolute positions (includes vision tokens,
            matching ``src/aki.py:184-191``).
        spec: MMA block spec (None = causal).
        kv_valid: validity over keys — (B, T) without cache, (B, S) over the
            full cache buffer with cache.
        q_offset: absolute position of the first query row (decode steps).
        cache / cache_index: optional KV cache and per-sample write offsets.
        remat: checkpoint each layer (reference activation checkpointing,
            ``train/train.py:314-327``).

    Returns:
        (hidden_states (B, T, D) fp-compute, updated cache or None).
    """
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    if with_aux and cache is not None:
        raise ValueError(
            "with_aux is only tracked on the no-cache (training) path; "
            "cached decode discards the per-layer MoE aux terms"
        )
    aux = jnp.zeros((), jnp.float32)   # MoE load-balance loss (with_aux)
    x = inputs_embeds.astype(policy.compute_dtype)
    if sp_mesh is not None:
        # sequence parallelism: decoder activations shard along T. GSPMD
        # shards every per-token op (norms, matmuls, rope) from this one
        # constraint; only attention needs the explicit shard_map.
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = tuple(a for a in ("data", "fsdp") if a in sp_mesh.shape)
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(sp_mesh, P(batch or None, "seq", None))
        )
    cos, sin = rope_cos_sin(cfg.rope, positions)
    eps = cfg.rms_norm_eps

    layers = policy.cast(params["layers"])

    if cache is not None:
        # The cache rides the scan CARRY: XLA aliases carry buffers across
        # iterations, so the scatter (decode) / dynamic-update-slice
        # (prefill) writes happen in place. Perf notes from v5e: routing
        # the cache through scan xs/ys copies it every step (44 ms/step
        # decode); unrolling the layer loop with static .at[li] updates
        # also copies (305 ms/step); carry + scatter decodes at ~16 ms/step.
        t = inputs_embeds.shape[1]
        wpos = jnp.asarray(cache_index, jnp.int32)[:, None] + jnp.arange(t)[None]

        if isinstance(cache, KVCacheQ):
            def body_q8(carry, scanned):
                x, k8, ks, v8, vs = carry
                lp, li = scanned
                y, new_kv, _ = _attention_layer(
                    x, lp, cos, sin, cfg, spec, kv_valid, q_offset,
                    ("q8", k8, ks, v8, vs, li, wpos), use_flash, eps,
                    tp_mesh, live_width=live_width,
                    cache_slots=cache_slots,
                )
                return (y, *new_kv), None

            (x, k8, ks, v8, vs), _ = jax.lax.scan(
                body_q8, (x, cache.k, cache.ks, cache.v, cache.vs),
                (layers, jnp.arange(cfg.num_layers)),
            )
            new_cache = KVCacheQ(k=k8, ks=ks, v=v8, vs=vs)
        else:
            def body_cached(carry, scanned):
                x, ck, cv = carry
                lp, li = scanned
                y, new_kv, _ = _attention_layer(
                    x, lp, cos, sin, cfg, spec, kv_valid, q_offset,
                    ("bf16", ck, cv, li, wpos), use_flash, eps, tp_mesh,
                    cache_slots=cache_slots,
                )
                return (y, new_kv[0], new_kv[1]), None

            (x, new_k, new_v), _ = jax.lax.scan(
                body_cached, (x, cache.k, cache.v),
                (layers, jnp.arange(cfg.num_layers)),
            )
            new_cache = KVCache(k=new_k, v=new_v)
    else:
        def body(carry, lp):
            x, aux_sum = carry
            y, _, aux = _attention_layer(
                x, lp, cos, sin, cfg, spec, kv_valid, q_offset,
                None, use_flash, eps, tp_mesh, sp_mesh, ep_mesh,
            )
            return (y, aux_sum + aux), None

        if remat:
            body = jax.checkpoint(body, policy=_remat_policy())
        (x, aux), _ = jax.lax.scan(
            body, (x, jnp.zeros((), jnp.float32)), layers
        )
        new_cache = None

    x = rmsnorm(policy.cast(params["final_norm"]), x, eps)
    if with_aux:
        return x, new_cache, aux
    return x, new_cache
