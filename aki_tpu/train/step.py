"""The jit/pjit train step: loss, grads, accumulation, update.

TPU-first analogues of the reference hot loop (``train_utils.py:214-287``):

- forward/backward under bf16 compute with fp32 master params (amp_bf16);
- activation checkpointing per decoder layer (``remat=True``);
- gradient accumulation as a ``lax.scan`` over microbatches — one compiled
  step regardless of the accumulation factor (the reference loops in Python
  per dataset, ``train_utils.py:226-252``);
- global-norm clip + AdamW live inside the optax chain;
- everything runs under GSPMD: params carry NamedShardings, the batch is
  sharded over the (data, fsdp) axes, donated state keeps HBM flat.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models.aki import aki_forward
from ..models.common import Policy
from ..models.configs import AKIConfig
from .optim import is_frozen_path, path_mask


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @staticmethod
    def create(params, optimizer) -> "TrainState":
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Batch:
    """One (micro)batch. For grad accumulation, stack microbatches on a
    leading axis."""

    input_ids: jax.Array    # (..., B, T)
    images: jax.Array       # (..., B, H, W, C)
    attn_valid: jax.Array   # (..., B, T)
    labels: jax.Array       # (..., B, T)
    # per-batch loss multiplier (reference --loss_multiplier_X,
    # train/train.py:100-116); scalar, default 1
    loss_weight: jax.Array | None = None


def make_loss_fn(cfg: AKIConfig, policy: Policy, remat: bool,
                 use_flash: bool | None, order: str = "image_first",
                 host_offload: bool = False, sp_mesh=None, pp_mesh=None,
                 pp_microbatches=None, moe_aux_weight: float = 0.01,
                 ep_mesh=None):
    def loss_fn(params, batch: Batch):
        out = aki_forward(
            params, cfg, batch.input_ids, batch.images, batch.attn_valid,
            labels=batch.labels, policy=policy, remat=remat,
            use_flash=use_flash, order=order, sp_mesh=sp_mesh,
            pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
            ep_mesh=ep_mesh,
        )
        loss = out.loss
        if batch.loss_weight is not None:
            # the per-dataset multiplier scales the CE loss only
            # (reference train.py:103); router balance pressure must not
            # vary by dataset
            loss = loss * batch.loss_weight
        if out.aux is not None:
            # Switch load-balance term — without it the MoE router
            # collapses onto one expert and capacity dropping zeroes
            # most tokens' MLP output
            loss = loss + moe_aux_weight * out.aux
        return loss

    if host_offload:
        # TPU-native analogue of the reference's FSDP
        # ``offload_to_cpu=True`` (train.py:314-327, distributed.py:207-210):
        # saved activations move to pinned host memory between forward and
        # backward instead of occupying HBM — XLA overlaps the transfers.
        policy_off = jax.checkpoint_policies.offload_dot_with_no_batch_dims(
            "device", "pinned_host"
        )
        return jax.checkpoint(loss_fn, policy=policy_off)
    return loss_fn


def make_train_step(
    cfg: AKIConfig,
    optimizer: optax.GradientTransformation,
    policy: Policy = Policy(),
    remat: bool = True,
    use_flash: bool | None = None,
    grad_accum: int = 1,
    order: str = "image_first",
    loss_scale: float = 1.0,
    host_offload: bool = False,
    sp_mesh=None,
    pp_mesh=None,
    pp_microbatches=None,
    moe_aux_weight: float = 0.01,
    ep_mesh=None,
    grad_shardings=None,
    param_shardings=None,
    frozen_predicate: Callable[[str], bool] = is_frozen_path,
    accum_unroll: bool = False,
) -> Callable[[TrainState, Batch], tuple[TrainState, dict]]:
    """Build the (un-jitted) train step; jit with donate_argnums=(0,).

    ``grad_shardings``: optional NamedSharding tree (params structure) to
    constrain gradients to — ZeRO-2 mode passes the full-shard (fsdp)
    shardings here while params themselves replicate over fsdp, so XLA
    reduce-scatters grads and runs a sharded optimizer update (reference
    ``ShardingStrategy.SHARD_GRAD_OP``, ``train/distributed.py:198-199``).

    Param/optimizer host offload (reference ``CPUOffload(offload_params)``,
    ``distributed.py:207-210``) lives in the Trainer, which moves the
    state pinned_host <-> device around this step — XLA's
    memory-kind-annotated jit outputs are not supported on every backend,
    so the residency transfers stay outside the jit.
    """
    loss_fn = make_loss_fn(cfg, policy, remat, use_flash, order,
                           host_offload=host_offload, sp_mesh=sp_mesh,
                           pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
                           moe_aux_weight=moe_aux_weight, ep_mesh=ep_mesh)

    def scaled_loss(params, micro):
        return loss_fn(params, micro) * loss_scale

    grad_fn = jax.value_and_grad(scaled_loss)

    def compute(params, batch: Batch):
        if grad_accum == 1:
            return grad_fn(params, batch)

        # Frozen subtrees (stop_gradient'd in the forward, aki.py:75) have
        # structurally-zero grads — carrying full-size f32 zeros for them
        # through the accumulation wastes HBM for the whole step (1.65 GB
        # at AKI-4B: the difference between the accumulated bs8-micro step
        # fitting and OOMing by 529 MB). Accumulate trainable leaves only;
        # rebuild the frozen leaves as broadcast zeros at the end.
        # frozen_predicate must match the optimizer's (defaults agree).
        frozen = path_mask(params, frozen_predicate)

        if accum_unroll:
            # Unrolled accumulation: a lax.scan double-buffers the carried
            # f32 grad tree across the while-loop boundary (measured: two
            # AllocateBuffer copies of every trainable grad leaf, +2.9 GB
            # at AKI-4B depth-4, 48% HLO-temp fragmentation on top — the
            # scan form OOMs where the unrolled form fits). Unrolling lets
            # the scheduler single-buffer the accumulator; compile time
            # scales with grad_accum, so this is the small-factor option.
            loss = jnp.zeros((), jnp.float32)
            grads = jax.tree.map(
                lambda fz, p: jnp.zeros(() if fz else p.shape, jnp.float32),
                frozen, params,
            )
            for i in range(grad_accum):
                micro = jax.tree.map(lambda x: x[i], batch)
                l, g = grad_fn(params, micro)
                loss = loss + l
                grads = jax.tree.map(
                    lambda fz, s, gi: s if fz else s + gi, frozen, grads, g
                )
        else:
            def acc(carry, micro):
                loss_sum, grads_sum = carry
                l, g = grad_fn(params, micro)
                return (
                    loss_sum + l,
                    jax.tree.map(lambda fz, s, gi: s if fz else s + gi,
                                 frozen, grads_sum, g),
                ), None

            zero = jax.tree.map(
                lambda fz, p: jnp.zeros(() if fz else p.shape, jnp.float32),
                frozen, params,
            )
            (loss, grads), _ = jax.lax.scan(
                acc, (jnp.zeros((), jnp.float32), zero), batch
            )
        grads = jax.tree.map(
            lambda fz, p, g: jnp.zeros(p.shape, jnp.float32) if fz
            else g / grad_accum,
            frozen, params, grads,
        )
        return loss / grad_accum, grads

    def train_step(state: TrainState, batch):
        if isinstance(batch, tuple):
            # reference multi-dataset semantics (train_utils.py:215-252):
            # ONE optimizer step consumes one batch from EVERY dataset;
            # each dataset's (weighted) loss backprops and the gradients
            # SUM — no division by the dataset count. Shapes may differ
            # per dataset (per-dataset batch_size / max_text_len), so the
            # loop is unrolled, not scanned.
            loss = jnp.zeros((), jnp.float32)
            grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            for b in batch:
                l, g = compute(state.params, b)
                loss = loss + l
                grads = jax.tree.map(jnp.add, grads, g)
            loss = loss / len(batch)  # logged as the mean; grads stay summed
        else:
            loss, grads = compute(state.params, batch)

        if grad_shardings is not None:
            # ZeRO-2: grads reduce-scatter onto the fsdp axis; the Adam
            # update then runs sharded against the fsdp-sharded moments,
            # and apply_updates all-gathers the (small) updates back onto
            # the replicated params — one gather per step, not per layer
            grads = jax.lax.with_sharding_constraint(grads, grad_shardings)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        if param_shardings is not None:
            # pin the updated params back to their (ZeRO-2: fsdp-replicated)
            # placement — without this GSPMD may propagate the sharded
            # update layout into the new params
            params = jax.lax.with_sharding_constraint(params, param_shardings)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {"loss": loss / loss_scale, "grad_norm": grad_norm}
        return new_state, metrics

    return train_step


def jit_train_step(train_step, mesh, batch_sharding=None):
    """jit with donated state; shardings come from the arrays themselves."""
    return jax.jit(train_step, donate_argnums=(0,))
