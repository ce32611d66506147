"""Mixture-of-Experts MLP with expert parallelism (framework capability).

The reference model family is dense (Phi-3.5-mini — SURVEY §2.6: "EP/MoE
absent").  aki_tpu ships MoE as a first-class decoder option so the
framework covers every parallelism mode on TPU:

- **Capacity-bounded scatter dispatch** (default): top-k routing computes
  each (token, choice)'s position inside its expert's buffer with one
  cumsum, then tokens move to the per-expert (E, C, D) buffers with a
  single unique-index scatter and come back with a gather — O(N·k·D)
  data movement and an O(N·k·E) int transient, static shapes throughout.
  Capacity overflow drops tokens exactly like the classic TPU MoE stacks.
- **Dense one-hot dispatch** (``dispatch="dense"``): the Shazeer-style
  (N, E, C) one-hot einsum formulation — kept as the differential oracle
  for the scatter path. Its dispatch matmul costs O(N²·k·D) FLOPs and the
  (N, k, E, C) slot one-hot grows O(k²·N²), which is why it is no longer
  the default: at 4B-scale token counts (~10k tokens/step) the transient
  alone reaches GB scale, while the scatter path stays linear in N.
- **Expert parallelism**: expert weights carry a leading E dim sharded
  over the ``expert`` mesh axis (``parallel/sharding.py`` rule); a
  ``with_sharding_constraint`` pins the dispatched (E, ...) buffer to the
  same axis, and GSPMD inserts the all-to-alls.
- **Aux load-balancing loss** (Switch-style): mean(frac_tokens *
  frac_router_prob) * E, returned for the trainer to weight in.

``moe_mlp`` is a drop-in replacement for the SiLU-gated dense MLP in
``models/phi3.py`` — same (B, T, D) -> (B, T, D) contract, gated by
``Phi3Config.moe``.
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
    dispatch: str = "scatter",
) -> tuple[jax.Array, jax.Array]:
    """Returns (output (B, T, D), aux load-balancing loss scalar)."""
    if dispatch not in ("scatter", "dense"):
        raise ValueError(f"dispatch {dispatch!r}")
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
    gk = gates.astype(x.dtype) * keep.astype(x.dtype)             # (N, k)

    if dispatch == "scatter":
        # flat slot index e*C + pos per (token, choice); dropped choices
        # get index E*C, out of bounds -> scatter mode="drop" discards
        # them. (expert, pos) pairs are unique by construction, so the
        # scatter has no collisions.
        slot = jnp.where(keep, top_idx * cap + pos, e * cap)      # (N, k)
        tok_of = jnp.broadcast_to(
            jnp.arange(n_tok, dtype=jnp.int32)[:, None], (n_tok, k)
        ).reshape(-1)
        buf = (
            jnp.zeros((e * cap, d), x.dtype)
            .at[slot.reshape(-1)]
            .set(jnp.take(xf, tok_of, axis=0), mode="drop")
            .reshape(e, cap, d)
        )
    else:
        # (N, k, E, C) slot one-hot, built ONCE: 1 where choice (n, k)
        # lands in expert slot (e, c)
        ek = (
            jax.nn.one_hot(top_idx, e, dtype=x.dtype)[..., None]
            * jax.nn.one_hot(jnp.where(keep, pos, cap), cap + 1,
                             dtype=x.dtype)[..., :cap][:, :, None, :]
        )
        dis = ek.sum(1)                                           # (N, E, C)
        buf = jnp.einsum("nec,nd->ecd", dis, xf)                  # (E, C, D)

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

    if dispatch == "scatter":
        # gather each kept choice's expert output row; dropped choices
        # read a zero fill and their gk is 0 anyway
        rows = jnp.take(out_buf.reshape(e * cap, d), slot.reshape(-1),
                        axis=0, mode="fill", fill_value=0)
        out = jnp.sum(rows.reshape(n_tok, k, d) * gk[..., None], axis=1)
    else:
        combine = (gk[..., None, None] * ek).sum(1)               # (N, E, C)
        out = jnp.einsum("nec,ecd->nd", combine, out_buf)

    # Switch-transformer aux loss: E * mean_e(frac_tokens_e * frac_prob_e)
    frac_tokens = jnp.mean(
        jax.nn.one_hot(top_idx[:, 0], e, dtype=jnp.float32), axis=0
    )
    frac_probs = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_tokens * frac_probs)

    return out.reshape(b, t, d), aux
