"""Int8 quantization for serving: weight-only (w8) and dynamic W8A8.

Two modes, selected at :func:`quantize_params` time:

- **w8** (weight-only, default): kernels become :class:`QuantTensor`
  (``q``: int8 (in, out), ``s``: (1, out) bf16); matmuls convert tiles on
  the fly (``x @ q.astype(bf16) * s``) — the MXU runs bf16, accuracy is
  near-lossless (per-output-channel max-abs), and decode weight reads
  halve (v5e decode is weight-read bound, ~7.2 GB of bf16 decoder weights
  per step).
- **w8a8** (dynamic activation quant): ``a8=True`` on the tensor;
  :func:`mm` quantizes activations per token row (symmetric max-abs over
  the hidden dim) and issues an int8 x int8 ``dot_general`` with
  ``preferred_element_type=int32`` — on v5e this runs the MXU's native
  int8 path at ~2x the bf16 peak, which is what lets *prefill*
  (compute-bound) beat the bf16 MFU wall. The output rescales by
  ``s_act (rows) * s_w (cols)`` in one fused multiply.

Only the big decoder matmuls and the LM head quantize; embeddings, norms,
the vision tower and the perceiver stay bf16.  The forward path is
polymorphic through :func:`mm` — the same model code serves all three
representations, so training is untouched.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


@dataclasses.dataclass
class QuantTensor:
    """Int8 kernel + per-output-channel scale; ``a8`` (static metadata)
    switches :func:`mm` to the dynamic-activation int8 x int8 path."""

    q: jax.Array
    s: jax.Array
    a8: bool = False


jax.tree_util.register_dataclass(
    QuantTensor, data_fields=["q", "s"], meta_fields=["a8"]
)


def quantize_tensor(w: jax.Array, a8: bool = False,
                    bits: int = 8) -> QuantTensor:
    """Per-output-channel symmetric int8/int4 over the last dim's columns.

    w: (..., in, out) -> QuantTensor(q int8|int4 same shape,
    s (..., 1, out)). ``bits=4`` halves the weight-stream bytes again
    (decode is weight-read bound); per-channel int4 is coarse — an
    explicit speed/accuracy tradeoff, not the default.
    """
    assert bits in (8, 4)
    maxq = 127 if bits == 8 else 7
    dtype = jnp.int8 if bits == 8 else jnp.int4
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / maxq)
    q = jnp.clip(jnp.round(w32 / scale), -maxq, maxq).astype(dtype)
    return QuantTensor(q=q, s=scale.astype(jnp.bfloat16), a8=a8)


def is_quantized(w) -> bool:
    return isinstance(w, QuantTensor)


def quantize_acts(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (token) symmetric int8 over the last dim."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized kernels.

    The a8 path engages only when the row count (static) is large enough
    for the int8 MXU win to beat the act-quant + int32-epilogue overhead:
    prefill (thousands of rows) quantizes, decode (a handful) streams the
    int8 weights into a bf16 matmul instead.
    """
    if is_quantized(w):
        rows = int(np.prod(x.shape[:-1]))
        if w.a8 and rows >= 64:
            xq, sx = quantize_acts(x)
            wq = w.q if w.q.dtype == jnp.int8 else w.q.astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, wq,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                y.astype(jnp.float32) * sx * w.s.astype(jnp.float32)
            ).astype(x.dtype)
        y = x @ w.q.astype(x.dtype)
        return y * w.s.astype(x.dtype)
    return x @ w


def take_columns(w, end: int):
    """w[:, :end] for plain or quantized kernels (LM head truncation)."""
    if is_quantized(w):
        return QuantTensor(q=w.q[..., :end], s=w.s[..., :end], a8=w.a8)
    return w[..., :end]


def pad_attention_heads(layers: dict, num_heads: int, head_dim: int,
                        pad_to: int = 128) -> dict:
    """Serving-layout prep: pad each attention head to ``pad_to`` lanes
    INSIDE the projection weights, so q/k/v come out of their matmuls
    already 128-aligned per head — the flash kernel then reads flat
    (B, T, H*128) operands with aligned lane slices and the pad/transpose
    relayouts around the pallas call disappear (measured ~3 ms/layer at
    AKI-4B prefill shapes).

    Layout per head (neox RoPE compatibility): the two rotary halves pad
    independently — ``[q1 (d/2), 0.., q2 (d/2), 0..]`` — so rotate-half at
    ``pad_to/2`` maps real lanes onto real lanes and pad lanes stay zero.
    ``wv`` pads at the tail (no rope), and ``wo`` gains zero ROWS at the
    pad lanes so it consumes the flat attention output directly.

    Returns a dict with wq/wk/wv (in, H*pad_to) and wo (H*pad_to, out).
    Extra MXU cost: +(pad_to/head_dim - 1) on the qkv column and wo row
    dims (~+1.3 ms/layer int8 at 4B) — less than half the relayout saving.
    """
    h, d, L = num_heads, head_dim, layers["wq"].shape[0]
    half, phalf = d // 2, pad_to // 2

    def pad_rope_cols(w):  # (L, in, h*d) -> (L, in, h*pad_to), half-aligned
        wh = w.reshape(L, w.shape[1], h, 2, half)
        out = jnp.zeros((L, w.shape[1], h, 2, phalf), w.dtype)
        out = out.at[..., :half].set(wh)
        return out.reshape(L, w.shape[1], h * pad_to)

    def pad_tail_cols(w):  # v: plain tail pad per head
        wh = w.reshape(L, w.shape[1], h, d)
        out = jnp.zeros((L, w.shape[1], h, pad_to), w.dtype)
        out = out.at[..., :d].set(wh)
        return out.reshape(L, w.shape[1], h * pad_to)

    def pad_rows(w):       # wo: (L, h*d, out) -> (L, h*pad_to, out)
        wh = w.reshape(L, h, d, w.shape[2])
        out = jnp.zeros((L, h, pad_to, w.shape[2]), w.dtype)
        out = out.at[:, :, :d].set(wh)
        return out.reshape(L, h * pad_to, w.shape[2])

    return {
        "wq": pad_rope_cols(layers["wq"]),
        "wk": pad_rope_cols(layers["wk"]),
        "wv": pad_tail_cols(layers["wv"]),
        "wo": pad_rows(layers["wo"]),
    }


def quantize_params_padded(params: dict, phi3_cfg, mode: str = "w8a8",
                           pad_to: int = 128) -> dict:
    """Serving prep: :func:`pad_attention_heads` on the decoder attention
    weights, then :func:`quantize_params` — the engine detects the padded
    layout from the weight shapes and runs the flat attention path."""
    out = dict(params)
    phi3 = dict(params["phi3"])
    layers = dict(phi3["layers"])
    layers.update(pad_attention_heads(
        layers, phi3_cfg.num_heads, phi3_cfg.head_dim, pad_to=pad_to
    ))
    phi3["layers"] = layers
    out["phi3"] = phi3
    return quantize_params(out, mode=mode)


def quantize_params(params: dict, mode: str = "w8",
                    fuse: bool = False, vision: bool = True) -> dict:
    """Quantize the big matmuls of a full AKI param tree for serving.

    mode: "w8" | "w8a8" | "w4" | "w4a8" — weight bits (8/4) x whether
    activations quantize dynamically (the int8 MXU path).
    fuse: concatenate wq|wk|wv -> "wqkv" and w_gate|w_up -> "w_gateup"
        (and the SigLIP qkv) — one activation-quantize + one wider MXU dot
        instead of three; per-output-channel scales concatenate exactly,
        so numerics are identical to the split form.  Measured SLOWER on
        v5e (637 vs 550 ms bs16 prefill: the sliced halves of one wide
        output stop fusing into their consumers), so off by default.
    vision: also quantize the SigLIP encoder matmuls (biases stay float).
    """
    assert mode in ("w8", "w8a8", "w4", "w4a8"), mode
    a8 = mode.endswith("a8")
    bits = 4 if mode.startswith("w4") else 8
    out = dict(params)
    phi3 = dict(params["phi3"])
    layers = dict(phi3["layers"])
    if fuse:
        layers["wqkv"] = quantize_tensor(
            jnp.concatenate(
                [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")],
                axis=-1,
            ), a8=a8, bits=bits,
        )
        layers["w_gateup"] = quantize_tensor(
            jnp.concatenate(
                [layers.pop("w_gate"), layers.pop("w_up")], axis=-1
            ), a8=a8, bits=bits,
        )
        for k in ("wo", "w_down"):
            layers[k] = quantize_tensor(layers[k], a8=a8, bits=bits)
    else:
        for k in QUANT_KEYS:
            layers[k] = quantize_tensor(layers[k], a8=a8, bits=bits)
    phi3["layers"] = layers
    out["phi3"] = phi3
    out["lm_head"] = {"w": quantize_tensor(params["lm_head"]["w"], a8=a8, bits=bits),
                      **({"b": params["lm_head"]["b"]}
                         if "b" in params["lm_head"] else {})}
    if vision and "siglip" in params:
        # the vision tower stays 8-bit even in w4 modes: decode never
        # touches it (int4 there saves nothing) and 4-bit convs/attn
        # would cost accuracy for free
        bits = 8
        sl = dict(params["siglip"])
        sly = dict(sl["layers"])
        if fuse:
            sly["wqkv"] = quantize_tensor(
                jnp.concatenate(
                    [sly.pop("wq"), sly.pop("wk"), sly.pop("wv")], axis=-1
                ), a8=a8,
            )
            sly["bqkv"] = jnp.concatenate(
                [sly.pop("bq"), sly.pop("bk"), sly.pop("bv")], axis=-1
            )
        else:
            for k in ("wq", "wk", "wv"):
                sly[k] = quantize_tensor(sly[k], a8=a8, bits=bits)
        sly["wo"] = quantize_tensor(sly["wo"], a8=a8, bits=bits)
        sly["fc1"] = {"w": quantize_tensor(sly["fc1"]["w"], a8=a8, bits=bits),
                      "b": sly["fc1"]["b"]}
        sly["fc2"] = {"w": quantize_tensor(sly["fc2"]["w"], a8=a8, bits=bits),
                      "b": sly["fc2"]["b"]}
        sl["layers"] = sly
        out["siglip"] = sl
    return out
