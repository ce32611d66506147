"""Functional NN primitives: explicit param pytrees, no module framework.

Every component follows the same convention:

- ``init_*(key, ...) -> dict`` creates a param subtree (fp32 by default);
- ``apply`` functions take the subtree + inputs and are pure.

Kernels are stored ``(in, out)`` so application is ``x @ W`` (row-major
activations hit the MXU directly).  A :class:`Policy` casts params to the
compute dtype at the point of use (the JAX analogue of the reference's
``amp_bf16`` autocast, ``train/train_utils.py:56-65``), keeping master
params fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy (reference: FSDP MixedPrecision fp32 params +
    bf16 compute, ``train/distributed.py:142-167``)."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    def cast(self, x):
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


F32 = Policy(compute_dtype=jnp.float32)
BF16 = Policy()


def init_linear(key, d_in: int, d_out: int, bias: bool = True,
                scale: float | None = None, dtype=jnp.float32) -> Params:
    if scale is None:
        scale = d_in ** -0.5
    p = {"w": jax.random.normal(key, (d_in, d_out), dtype) * scale}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_layernorm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_rmsnorm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype)}


def rmsnorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def init_embedding(key, vocab: int, d: int, scale: float = 0.02,
                   dtype=jnp.float32) -> Params:
    return {"table": jax.random.normal(key, (vocab, d), dtype) * scale}


def embedding_lookup(p: Params, ids: jax.Array) -> jax.Array:
    return jnp.take(p["table"], ids, axis=0)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def count_params(tree) -> int:
    return sum(int(a.size) for a in jax.tree.leaves(tree))
