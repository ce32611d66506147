"""Mixture-of-Experts MLP with expert parallelism (framework capability).

The reference model family is dense (Phi-3.5-mini — SURVEY §2.6: "EP/MoE
absent").  aki_tpu ships MoE as a first-class decoder option so the
framework covers every parallelism mode on TPU:

- **Dense one-hot dispatch** (Shazeer-style): top-k routing produces a
  (B, T, E, C) dispatch tensor via an in-expert-position one-hot; tokens
  move to per-expert buffers with one einsum and come back with another.
  No ragged shapes, no sorting — everything is static-shape matmuls the
  MXU likes, and capacity overflow drops tokens exactly like the classic
  TPU MoE stacks.
- **Expert parallelism**: expert weights carry a leading E dim sharded
  over the ``expert`` mesh axis (``parallel/sharding.py`` rule); a
  ``with_sharding_constraint`` pins the dispatched (E, ...) buffer to the
  same axis, and GSPMD inserts the all-to-alls.
- **Aux load-balancing loss** (Switch-style): mean(frac_tokens *
  frac_router_prob) * E, returned for the trainer to weight in.

``moe_mlp`` is a drop-in replacement for the SiLU-gated dense MLP in
``models/phi3.py`` — same (B, T, D) -> (B, T, D) contract, gated by
``Phi3Config.moe``.

Scaling limit of the dense dispatch: the (N, k, E, C) one-hot tensor has
C ~ N*k/E, so its transient footprint grows as O(k^2 * N^2) per layer —
fine at the tested geometries (and the EP-sharded (E, C, D) buffers are
what persist), but at 4B-scale token counts (~10k tokens/step) the
dispatch one-hot alone reaches GB scale. Before running MoE at that
geometry, switch dispatch to a chunked or sort-based (ragged) scheme;
the routing/aux contract here stays the same.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Params
from .configs import MoEConfig

__all__ = ["MoEConfig", "init_moe", "moe_mlp"]


def init_moe(key, d: int, cfg: MoEConfig, init_range: float,
             dtype=jnp.float32) -> Params:
    e, inter = cfg.num_experts, cfg.intermediate_size
    ks = jax.random.split(key, 4)

    def w(k, *shape):
        return jax.random.normal(k, shape, dtype) * init_range

    return {
        "router": {"w": w(ks[0], d, e)},
        "w_gate": w(ks[1], e, d, inter),
        "w_up": w(ks[2], e, d, inter),
        "w_down": w(ks[3], e, inter, d),
    }


def moe_mlp(
    params: Params,
    x: jax.Array,            # (B, T, D)
    cfg: MoEConfig,
    mesh=None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (output (B, T, D), aux load-balancing loss scalar)."""
    b, t, d = x.shape
    e, k = cfg.num_experts, cfg.top_k
    n_tok = b * t
    cap = int(-(-n_tok * k * cfg.capacity_factor // e))  # ceil
    cap = max(cap, 1)

    xf = x.reshape(n_tok, d)
    logits = jnp.einsum(
        "nd,de->ne", xf, params["router"]["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)   # (N, E)

    # top-k gates, renormalized over the chosen experts
    top_p, top_idx = jax.lax.top_k(probs, k)                      # (N, k)
    gates = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

    # position of each (token, choice) within its expert's buffer:
    # cumsum over tokens of the expert one-hot, k choices interleaved so
    # first choices fill before second choices (priority to primary expert)
    onehot = jax.nn.one_hot(top_idx, e, dtype=jnp.int32)          # (N, k, E)
    flat = onehot.transpose(1, 0, 2).reshape(k * n_tok, e)        # choice-major
    pos_flat = jnp.cumsum(flat, axis=0) - 1                       # (kN, E)
    pos = (pos_flat * flat).sum(-1).reshape(k, n_tok).T           # (N, k)
    in_cap = pos < cap
    keep = in_cap & (top_p > 0)

    # (N, k, E, C) slot one-hot, built ONCE: 1 where choice (n, k) lands in
    # expert slot (e, c); dispatch and combine differ only by the scalar
    # gate factor per (n, k)
    ek = (
        jax.nn.one_hot(top_idx, e, dtype=x.dtype)[..., None]
        * jax.nn.one_hot(jnp.where(keep, pos, cap), cap + 1,
                         dtype=x.dtype)[..., :cap][:, :, None, :]
    )
    dis = ek.sum(1)                                               # (N, E, C)
    combine = (
        (gates.astype(x.dtype) * keep.astype(x.dtype))[..., None, None] * ek
    ).sum(1)                                                      # (N, E, C)

    buf = jnp.einsum("nec,nd->ecd", dis, xf)                      # (E, C, D)
    if mesh is not None and "expert" in mesh.shape:
        from jax.sharding import NamedSharding, PartitionSpec as P

        buf = jax.lax.with_sharding_constraint(
            buf, NamedSharding(mesh, P("expert", None, None))
        )

    wg = params["w_gate"].astype(x.dtype)
    wu = params["w_up"].astype(x.dtype)
    wd = params["w_down"].astype(x.dtype)
    gate = jnp.einsum("ecd,edf->ecf", buf, wg)
    up = jnp.einsum("ecd,edf->ecf", buf, wu)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    out_buf = jnp.einsum("ecf,efd->ecd", h, wd)                   # (E, C, D)

    out = jnp.einsum("nec,ecd->nd", combine, out_buf)

    # Switch-transformer aux loss: E * mean_e(frac_tokens_e * frac_prob_e)
    frac_tokens = jnp.mean(
        jax.nn.one_hot(top_idx[:, 0], e, dtype=jnp.float32), axis=0
    )
    frac_probs = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_tokens * frac_probs)

    return out.reshape(b, t, d), aux
