"""Pipeline parallelism: decoder layers staged over the ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.6: PP absent — FSDP
only).  aki_tpu ships it as a first-class scaling mode for the decoder,
TPU-idiomatically: no torch-style stage processes, no NCCL P2P — one
``shard_map`` over the ``pipe`` axis in which

- the stacked layer params (leading L dim) are sharded so each device
  holds a contiguous block of L/P layers (one *stage*);
- the batch is split into M microbatches whose payloads (activations +
  positions + MMA spec + validity) flow stage-to-stage with
  ``lax.ppermute`` in a GPipe schedule of M + P - 1 ticks driven by one
  ``lax.scan`` (bubble fraction (P-1)/(M+P-1));
- the last stage's outputs are broadcast with a masked ``psum`` so every
  device returns the full hidden states; the whole loop is differentiable
  (``ppermute`` transposes to the reverse permutation, giving the 1F1B-
  style reverse flow for free from ``jax.grad``).

Composition: ``pipe`` x ``data`` in this version — assert fsdp/tensor/seq
are 1.  RoPE tables are recomputed per stage from the flowing positions
(cheap) instead of shipping cos/sin through the pipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.common import Policy
from ..models.configs import Phi3Config
from ..models.phi3 import _attention_layer
from ..ops.masks import MMASpec
from ..ops.rope import rope_cos_sin
from .mesh import PIPE_AXIS


def pp_param_rules():
    """Sharding rules for pipeline runs: stacked decoder layers split by
    stage along their leading L dim; everything else replicated (v1 keeps
    weights replicated over ``data`` — DDP semantics like the reference's
    non-FSDP path)."""
    return [
        (r"phi3/layers/", P(PIPE_AXIS)),
        (r".*", P()),
    ]


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
) -> jax.Array:
    """Training forward of the Phi-3 stack with pipelined layers.

    Same contract as the no-cache path of
    :func:`aki_tpu.models.phi3.phi3_forward` (returns post-final-norm
    hidden states); requires ``cfg.num_layers % pipe == 0`` and the local
    batch divisible by ``num_microbatches``.
    """
    from ..models.common import rmsnorm
    from ..ops.flash_mma import _normalize_spec, _shard_map

    n_pipe = mesh.shape[PIPE_AXIS]
    for ax in ("fsdp", "tensor", "seq"):
        assert mesh.shape.get(ax, 1) == 1, (
            f"pipeline v1 composes with data only; {ax}>1 unsupported"
        )
    assert cfg.num_layers % n_pipe == 0, "layers must split evenly by stage"
    m = num_microbatches or n_pipe
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"

    x = inputs_embeds.astype(policy.compute_dtype)
    b = x.shape[0]
    img_start, txt_start, txt_end, _ = _normalize_spec(spec, b)
    kv_valid = kv_valid.astype(jnp.int32)
    positions = positions.astype(jnp.int32)
    layers = policy.cast(params["layers"])
    eps = cfg.rms_norm_eps

    def run(layers_local, x, pos, i0, t0, t1, kvv):
        p = jax.lax.axis_index(PIPE_AXIS)
        b_local = x.shape[0]
        assert b_local % m == 0, (b_local, m)
        bm = b_local // m
        ticks = m + n_pipe - 1

        def split(a):
            return a.reshape((m, bm) + a.shape[1:])

        def pad(a):
            z = jnp.zeros((ticks - m,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, z], 0)

        stream = tuple(
            pad(split(a)) for a in (x, pos, i0, t0, t1, kvv)
        )

        def stage(payload):
            xx, pp, a0, a1, a2, vv = payload
            cos, sin = rope_cos_sin(cfg.rope, pp)
            sp = MMASpec(img_start=a0, txt_start=a1, txt_end=a2)

            def body(h, lp):
                # aux (MoE balance loss) is dropped in the pipeline path:
                # v1 stages dense layers only
                y, _, _ = _attention_layer(
                    h, lp, cos, sin, cfg, sp, vv, 0, None, use_flash, eps,
                )
                return y, None

            if remat:
                body = jax.checkpoint(
                    body,
                    policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable,
                )
            yy, _ = jax.lax.scan(body, xx, layers_local)
            return (yy, pp, a0, a1, a2, vv)

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
            return nxt, out[0]

        zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), stream)
        _, outs = jax.lax.scan(tick, zero, stream)

        # ticks p .. p+m-1 hold stage p's real work; the last stage's
        # window is the model output — masked psum broadcasts it
        ys = outs[n_pipe - 1:]                       # (M, bm, T, D)
        ys = jax.lax.psum(
            jnp.where(p == n_pipe - 1, ys, jnp.zeros_like(ys)), PIPE_AXIS
        )
        return ys.reshape((b_local,) + ys.shape[2:])

    shard_map = _shard_map()
    hidden = shard_map(
        run, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P("data")),
        out_specs=P("data"),
    )(layers, x, positions, img_start, txt_start, txt_end, kv_valid)

    return rmsnorm(policy.cast(params["final_norm"]), hidden, eps)
