"""Weight-only int8 quantization for serving.

Decode on v5e is weight-read bound (~7.2 GB of bf16 decoder weights per
step); per-output-channel symmetric int8 halves those bytes.  Quantized
kernels are ``{"q": int8 (in, out), "s": (1, out) bf16}``; matmuls convert
tiles on the fly (``x @ q.astype(bf16) * s``), so the MXU still runs bf16
and accuracy stays near-lossless (max-abs per channel).

Only the big decoder matmuls and the LM head quantize; embeddings, norms,
the vision tower (prefill-bound, compute-heavy) and the perceiver stay
bf16.  The forward path is polymorphic through :func:`mm` — the same model
code serves both representations, so training is untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_tensor(w: jax.Array) -> dict:
    """Per-output-channel symmetric int8 over the last dim's columns.

    w: (..., in, out) -> {"q": int8 same shape, "s": (..., 1, out)}.
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.bfloat16)}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized kernels."""
    if is_quantized(w):
        y = x @ w["q"].astype(x.dtype)
        return y * w["s"].astype(x.dtype)
    return x @ w


def take_columns(w, end: int):
    """w[:, :end] for plain or quantized kernels (LM head truncation)."""
    if is_quantized(w):
        return {"q": w["q"][..., :end], "s": w["s"][..., :end]}
    return w[..., :end]


def quantize_params(params: dict) -> dict:
    """Quantize the decoder matmuls + LM head of a full AKI param tree."""
    out = dict(params)
    phi3 = dict(params["phi3"])
    layers = dict(phi3["layers"])
    for k in QUANT_KEYS:
        layers[k] = quantize_tensor(layers[k])
    phi3["layers"] = layers
    out["phi3"] = phi3
    out["lm_head"] = {"w": quantize_tensor(params["lm_head"]["w"])}
    return out
