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
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# Fused single-pass act-quant kernels (ops/fused_quant.py) ahead of the
# int8 dots: "auto" engages the measured winner only — the vision
# layernorm site (1.32x in-scan on v5e; narrow d=1152 rows where XLA's
# 4-pass chain loses most). The other sites LOSE on v5e despite reading
# ~3x fewer bytes, because the Pallas DMA path tops out at ~260 GB/s vs
# XLA's ~450 GB/s fused streaming: rms 0.98x, gelu 0.91x in-scan; silu
# measured 1.05x at bs16 shapes but -1 img/s end-to-end at bs48
# (16.14 -> 15.13). "on" forces every site everywhere (tests exercise the
# kernels via interpret on CPU), "off" keeps the composed XLA path.
FUSED_ACT_QUANT = __import__("os").environ.get("AKI_FUSED_ACT_QUANT", "auto")
_FUSED_WINNING_SITES = frozenset(
    __import__("os").environ.get("AKI_FUSED_SITES", "ln").split(","))


def _fused_enabled(site: str) -> bool:
    if FUSED_ACT_QUANT == "auto":
        return (jax.default_backend() == "tpu"
                and site in _FUSED_WINNING_SITES)
    return FUSED_ACT_QUANT == "on"


class PreQuant(NamedTuple):
    """Activation already quantized by a fused kernel: :func:`mm` consumes
    it directly (skipping ``quantize_acts``). Never crosses a jit boundary —
    created and consumed inside one traced forward."""

    q: jax.Array          # int8 (..., d)
    s: jax.Array          # f32  (..., 1) per-row scales
    dtype: jnp.dtype      # output dtype for the consuming matmul


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

    ``x`` may also be a :class:`PreQuant` (a fused norm/act+quantize kernel
    already produced the int8 rows + scales) — the dot runs directly.
    """
    if isinstance(x, PreQuant):
        if not (is_quantized(w) and w.a8):
            raise TypeError("PreQuant activations need an a8 QuantTensor")
        wq = w.q if w.q.dtype == jnp.int8 else w.q.astype(jnp.int8)
        y = jax.lax.dot_general(
            x.q, wq,
            (((x.q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            y.astype(jnp.float32) * x.s * w.s.astype(jnp.float32)
        ).astype(x.dtype)
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


def _fusable(site: str, x: jax.Array, w) -> bool:
    """Should a fused single-pass quantize kernel feed the dot on ``w``?
    Mirrors :func:`mm`'s a8 gate (static row count >= 64) plus the fused
    kernels' own layout constraint (128-multiple cols)."""
    return (
        _fused_enabled(site)
        and is_quantized(w)
        and w.a8
        and int(np.prod(x.shape[:-1])) >= 64
        and x.shape[-1] % 128 == 0
    )


def norm_quant_acts(kind: str, p: dict, x: jax.Array, eps: float, probe):
    """Pre-matmul norm: fused norm+quantize (one HBM pass) when the
    consuming kernel ``probe`` takes the a8 path, else the plain norm.

    Returns a :class:`PreQuant` or a plain normed tensor — either way a
    valid first argument to :func:`mm`.
    """
    from ..ops import fused_quant as fq
    from .common import layernorm, rmsnorm

    if _fusable(kind, x, probe):
        if kind == "rms":
            q, s = fq.rmsnorm_quant(x, p["scale"], eps)
        else:
            q, s = fq.layernorm_quant(x, p["scale"], p["bias"], eps)
        return PreQuant(q=q, s=s, dtype=x.dtype)
    return rmsnorm(p, x, eps) if kind == "rms" else layernorm(p, x, eps)


def silu_mul_quant_acts(gate: jax.Array, up: jax.Array, probe):
    """Fused silu(gate)*up + quantize ahead of ``w_down`` when fusable."""
    from ..ops import fused_quant as fq

    if _fusable("silu", gate, probe):
        q, s = fq.silu_mul_quant(gate, up)
        return PreQuant(q=q, s=s, dtype=up.dtype)
    return jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up


def gelu_quant_acts(x: jax.Array, bias: jax.Array, probe):
    """Fused tanh-gelu(x + bias) + quantize ahead of ``fc2`` when fusable."""
    from ..ops import fused_quant as fq

    if _fusable("gelu", x, probe):
        q, s = fq.gelu_quant(x, bias)
        return PreQuant(q=q, s=s, dtype=x.dtype)
    return jax.nn.gelu((x + bias).astype(jnp.float32),
                       approximate=True).astype(x.dtype)


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
        fc1_w, fc1_b = sly["fc1"]["w"], sly["fc1"]["b"]
        fc2_w = sly["fc2"]["w"]
        if a8 and fc1_w.shape[-1] % 128:
            # lane-align the MLP width (SO400M: 4304 -> 4352) so the fused
            # gelu+quantize kernel can run; zero fc1 columns produce
            # gelu(0) == 0 activations that zero fc2 rows then ignore —
            # numerics are exactly the unpadded ones
            inter = fc1_w.shape[-1]
            pad = ((inter + 127) // 128) * 128 - inter
            fc1_w = jnp.pad(fc1_w, [(0, 0)] * (fc1_w.ndim - 1) + [(0, pad)])
            fc1_b = jnp.pad(fc1_b, [(0, 0)] * (fc1_b.ndim - 1) + [(0, pad)])
            fc2_w = jnp.pad(
                fc2_w, [(0, 0)] * (fc2_w.ndim - 2) + [(0, pad), (0, 0)])
        sly["fc1"] = {"w": quantize_tensor(fc1_w, a8=a8, bits=bits),
                      "b": fc1_b}
        sly["fc2"] = {"w": quantize_tensor(fc2_w, a8=a8, bits=bits),
                      "b": sly["fc2"]["b"]}
        sl["layers"] = sly
        out["siglip"] = sl
    return out
