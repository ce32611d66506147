"""Pipeline parallelism: decoder layers staged over the ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.6: PP absent — FSDP
only).  aki_tpu ships it as a first-class scaling mode for the decoder,
TPU-idiomatically: no torch-style stage processes, no NCCL P2P — one
``shard_map`` over the mesh in which

- the stacked layer params (leading L dim) are sharded so each device
  holds a contiguous block of L/P layers (one *stage*); within a stage,
  weight matrices additionally shard over ``fsdp`` on their output dim
  (ZeRO-3 storage) and are all-gathered just-in-time per layer inside the
  stage scan — backward turns the gather into a reduce-scatter of weight
  grads, exactly FSDP semantics;
- the batch is split into M microbatches whose payloads (activations +
  positions + MMA spec + validity + the running MoE aux loss) flow
  stage-to-stage with ``lax.ppermute`` in a GPipe schedule of M + P - 1
  ticks driven by one ``lax.scan`` (bubble fraction (P-1)/(M+P-1));
- the last stage's outputs are broadcast with a masked ``psum`` so every
  device returns the full hidden states; the whole loop is differentiable
  (``ppermute`` transposes to the reverse permutation, giving the 1F1B-
  style reverse flow for free from ``jax.grad``).

Composition: ``pipe`` x ``data`` x ``fsdp``. ``tensor``/``seq`` remain
future work (raise). MoE stages run their experts locally (dense compute;
the ``expert`` axis is not used inside the pipe) and the Switch aux loss
rides the microbatch payload. RoPE tables are recomputed per stage from
the flowing positions (cheap) instead of shipping cos/sin through the
pipe.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.common import Policy
from ..models.configs import Phi3Config
from ..models.phi3 import _attention_layer
from ..ops.masks import MMASpec
from ..ops.rope import rope_cos_sin
from .mesh import PIPE_AXIS

# path-suffix -> full-leaf spec for the stacked decoder layers under PP.
# Weight matrices shard (pipe on L, fsdp on their LAST dim — output-dim
# storage sharding, gathered just-in-time); norms/routers replicate within
# the stage (tiny).
_PP_LAYER_RULES: list[tuple[str, P]] = [
    (r"phi3/layers/ln", P(PIPE_AXIS)),
    (r"phi3/layers/moe/router/w", P(PIPE_AXIS)),
    (r"phi3/layers/moe/w_", P(PIPE_AXIS, None, None, "fsdp")),
    (r"phi3/layers/", P(PIPE_AXIS, None, "fsdp")),
]


def pp_param_rules():
    """Sharding rules for pipeline runs: stage-split stacked decoder layers
    (+ stage-internal fsdp on weight output dims); everything else
    replicated (the vision tower / perceiver / embeddings are small next to
    the decoder — they keep DDP semantics like the reference's non-FSDP
    path)."""
    return _PP_LAYER_RULES + [(r".*", P())]


def _layer_specs(layers, mesh):
    """Per-leaf PartitionSpecs of ``params['layers']`` matching
    :func:`pp_param_rules` (paths are re-prefixed with ``phi3/layers/`` so
    the same rule table drives placement and shard_map in_specs)."""
    from .sharding import _fit_spec, _path_str

    def one(path, leaf):
        p = "phi3/layers/" + _path_str(path)
        for pat, spec in _PP_LAYER_RULES:
            if re.search(pat, p):
                return _fit_spec(spec, leaf.ndim, mesh, leaf.shape)
        return P(PIPE_AXIS)

    return jax.tree_util.tree_map_with_path(one, layers)


def phi3_forward_pp(
    params: dict,
    cfg: Phi3Config,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    spec: MMASpec | None,
    kv_valid: jax.Array,
    mesh,
    num_microbatches: int | None = None,
    policy: Policy = Policy(),
    remat: bool = False,
    use_flash: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Training forward of the Phi-3 stack with pipelined layers.

    Same contract as the no-cache path of
    :func:`aki_tpu.models.phi3.phi3_forward`; returns
    ``(post-final-norm hidden states, summed MoE aux loss)`` (aux is 0 for
    dense configs). Requires ``cfg.num_layers % pipe == 0`` and the local
    batch divisible by ``num_microbatches``.
    """
    from ..models.common import rmsnorm
    from ..ops.flash_mma import _normalize_spec, _shard_map

    n_pipe = mesh.shape[PIPE_AXIS]
    n_fsdp = mesh.shape.get("fsdp", 1)
    for ax in ("tensor", "seq"):
        if mesh.shape.get(ax, 1) != 1:
            raise ValueError(
                f"pipeline composes with data/fsdp only; mesh has "
                f"{ax}={mesh.shape[ax]} (> 1 unsupported)"
            )
    if cfg.num_layers % n_pipe:
        raise ValueError(
            f"num_layers={cfg.num_layers} must split evenly over "
            f"pipe={n_pipe} stages"
        )
    m = num_microbatches or n_pipe
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"

    x = inputs_embeds.astype(policy.compute_dtype)
    b = x.shape[0]
    n_batch = mesh.shape.get("data", 1) * n_fsdp
    if b % n_batch or (b // n_batch) % m:
        raise ValueError(
            f"batch {b} must divide data*fsdp={n_batch} and the local "
            f"batch must divide num_microbatches={m}"
        )
    img_start, txt_start, txt_end, _ = _normalize_spec(spec, b)
    kv_valid = kv_valid.astype(jnp.int32)
    positions = positions.astype(jnp.int32)
    layers = policy.cast(params["layers"])
    layer_specs = _layer_specs(layers, mesh)
    eps = cfg.rms_norm_eps

    def run(layers_local, x, pos, i0, t0, t1, kvv):
        p = jax.lax.axis_index(PIPE_AXIS)
        b_local = x.shape[0]
        bm = b_local // m
        ticks = m + n_pipe - 1

        def split(a):
            return a.reshape((m, bm) + a.shape[1:])

        def pad(a):
            z = jnp.zeros((ticks - m,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, z], 0)

        stream = tuple(
            pad(split(a)) for a in (x, pos, i0, t0, t1, kvv)
        ) + (jnp.zeros((ticks,), jnp.float32),)   # flowing MoE aux

        def gather_layer(lp_tree, spec_tree):
            """JIT all-gather of this layer's fsdp-sharded weights (their
            full spec ends with 'fsdp'; per-layer slice axis = ndim-1)."""

            def one(w, s):
                if n_fsdp > 1 and len(s) and s[-1] == "fsdp":
                    return jax.lax.all_gather(
                        w, "fsdp", axis=w.ndim - 1, tiled=True
                    )
                return w

            return jax.tree.map(one, lp_tree, spec_tree,
                                is_leaf=lambda t: not isinstance(t, dict))

        # spec tree for per-layer slices: same structure, specs unchanged
        def stage(payload):
            xx, pp, a0, a1, a2, vv, aux = payload
            cos, sin = rope_cos_sin(cfg.rope, pp)
            sp = MMASpec(img_start=a0, txt_start=a1, txt_end=a2)

            def body(carry, lp):
                h, aux_sum = carry
                lp = gather_layer(lp, layer_specs)
                y, _, a = _attention_layer(
                    h, lp, cos, sin, cfg, sp, vv, 0, None, use_flash, eps,
                )
                return (y, aux_sum + a), None

            if remat:
                body = jax.checkpoint(
                    body,
                    policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable,
                )
            (yy, aux), _ = jax.lax.scan(body, (xx, aux), layers_local)
            return (yy, pp, a0, a1, a2, vv, aux)

        def tick(buf, incoming):
            # stage 0 consumes the next microbatch; later stages consume
            # what the previous stage ppermuted to them last tick
            inp = jax.tree.map(
                lambda inc, held: jnp.where(p == 0, inc, held),
                incoming, buf,
            )
            out = stage(inp)
            perm = [(i, i + 1) for i in range(n_pipe - 1)]
            nxt = jax.tree.map(
                lambda a: jax.lax.ppermute(a, PIPE_AXIS, perm), out
            )
            return nxt, (out[0], out[-1])

        zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), stream)
        _, (outs, auxs) = jax.lax.scan(tick, zero, stream)

        # ticks p .. p+m-1 hold stage p's real work; the last stage's
        # window is the model output — masked psum broadcasts it
        last = p == n_pipe - 1
        ys = outs[n_pipe - 1:]                       # (M, bm, T, D)
        ys = jax.lax.psum(
            jnp.where(last, ys, jnp.zeros_like(ys)), PIPE_AXIS
        )
        aux = jax.lax.psum(
            jnp.where(last, jnp.sum(auxs[n_pipe - 1:]), 0.0), PIPE_AXIS
        )
        # each microbatch's layer-aux is a mean over its own tokens, and
        # phi3_forward sums aux over layers — so sum over microbatches / m
        # matches the unpipelined value; pmean over the batch axes makes
        # the P() out_spec actually replicated (each data/fsdp group saw
        # disjoint tokens)
        aux = jax.lax.pmean(aux / m, ("data", "fsdp"))
        return ys.reshape((b_local,) + ys.shape[2:]), aux

    shard_map = _shard_map()
    batch = P(("data", "fsdp"))
    hidden, aux = shard_map(
        run, mesh=mesh,
        in_specs=(layer_specs, batch, batch, batch, batch, batch, batch),
        out_specs=(batch, P()),
    )(layers, x, positions, img_start, txt_start, txt_end, kv_valid)

    return rmsnorm(policy.cast(params["final_norm"]), hidden, eps), aux
