"""Shared training runner: model/optimizer build, epoch loop, resume.

The TPU-native shape of the reference's two loops
(``train_utils.py:78-287``): one jitted step (grad accumulation inside),
host-side data prefetch, periodic checkpoints, TensorBoard/JSONL metrics,
auto-resume.  Used by both the pretrain CLI (webdataset captions) and the
SFT CLI (weighted mixture), mirroring ``train.py`` /
``instruction_finetune.py``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator

import jax
import jax.numpy as jnp

from ..models.aki import init_aki
from ..models.common import Policy
from ..models.configs import AKIConfig
from ..parallel.mesh import MeshConfig, batch_sharding, create_mesh
from ..parallel.sharding import shard_params
from .checkpoints import CheckpointManager
from .metrics import AverageMeter, MetricsLogger
from .optim import (
    decay_everything, decay_except_embeddings, make_optimizer,
)
from .schedules import make_schedule
from .step import Batch, TrainState, make_train_step


@dataclasses.dataclass
class RunnerConfig:
    run_dir: str = "runs/default"
    learning_rate: float = 1e-4
    min_lr: float = 1e-6
    weight_decay: float = 0.1
    warmup_steps: int = 100
    total_steps: int = 1000
    lr_schedule: str = "cosine"
    grad_clip: float = 1.0
    grad_accum: int = 1
    accum_unroll: bool = False         # unroll the accumulation loop: the
                                       # lax.scan form double-buffers the
                                       # carried f32 grad tree (+2.9 GB at
                                       # AKI-4B); unrolling single-buffers
                                       # it at grad_accum-x compile time
    precision: str = "bf16"            # "bf16" (amp_bf16) | "fp32"
    remat: bool = True
    checkpoint_steps: int = 1000
    keep_last_checkpoints: int | None = None
    seed: int = 42
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    decay_policy: str = "all"          # "all" (AKI) | "except_embeddings"
    order: str = "image_first"         # MMA | DOT ablation ("text_first")
    training_mode: str = "scratch"     # scratch | resume | sft_scratch
    log_every: int = 10
    host_offload: bool = False         # saved activations -> pinned_host
                                       # (reference offload_to_cpu analogue)
    fsdp_strategy: str = "full"        # "full" (ZeRO-3) | "grad_op" (ZeRO-2:
                                       # params replicated over fsdp, grads +
                                       # optimizer state sharded; reference
                                       # SHARD_GRAD_OP, distributed.py:198)
    host_offload_params: bool = False  # params + opt state live pinned_host
                                       # between steps (reference CPUOffload
                                       # offload_params, distributed.py:207)
    pp_microbatches: int | None = None  # pipeline microbatches (mesh.pipe>1)
    moe_aux_weight: float = 0.01       # Switch aux-loss weight (MoE decoder)
    frozen_bf16: bool = False          # store frozen subtrees (SigLIP) in
                                       # bf16 — no master copy needed for
                                       # frozen params; compute bit-identical
                                       # (optim.cast_frozen_to), frees half
                                       # the frozen bytes (~0.85 GB at 4B)


class Trainer:
    def __init__(self, model_cfg: AKIConfig, run_cfg: RunnerConfig,
                 init_params=None):
        self.model_cfg = model_cfg
        self.cfg = run_cfg
        self.policy = (
            Policy() if run_cfg.precision == "bf16"
            else Policy(compute_dtype=jnp.float32)
        )
        self.mesh = create_mesh(run_cfg.mesh)
        self.is_main = jax.process_index() == 0

        # mesh axes beyond dp/fsdp/tp activate their code paths here — a
        # seq/pipe size in the YAML mesh block must not silently run
        # replicated redundant work
        sp_mesh = self.mesh if self.mesh.shape["seq"] > 1 else None
        pp_mesh = self.mesh if self.mesh.shape["pipe"] > 1 else None
        ep_mesh = self.mesh if self.mesh.shape["expert"] > 1 else None
        rules = None
        if pp_mesh is not None:
            from ..parallel.pipeline import pp_param_rules

            rules = pp_param_rules()

        params = init_params if init_params is not None else init_aki(
            jax.random.PRNGKey(run_cfg.seed), model_cfg
        )
        if run_cfg.frozen_bf16:
            from .optim import cast_frozen_to

            params = cast_frozen_to(params)
        if run_cfg.fsdp_strategy not in ("full", "grad_op"):
            raise ValueError(
                f"fsdp_strategy must be 'full' or 'grad_op', got "
                f"{run_cfg.fsdp_strategy!r}"
            )
        zero2 = run_cfg.fsdp_strategy == "grad_op"
        grad_shardings = param_out_shardings = None
        if zero2:
            from ..parallel.sharding import (
                param_shardings, strip_axis_rules,
            )

            # ZeRO-2: params replicate over fsdp (keep tensor/expert
            # splits); grads + Adam moments shard with the FULL rules
            stripped = strip_axis_rules("fsdp", rules)
            params = shard_params(params, self.mesh, rules=stripped)
            grad_shardings = param_shardings(params, self.mesh, rules=rules)
            param_out_shardings = param_shardings(
                params, self.mesh, rules=stripped
            )
        else:
            params = shard_params(params, self.mesh, rules=rules)
        schedule = make_schedule(
            run_cfg.lr_schedule, run_cfg.learning_rate, run_cfg.min_lr,
            run_cfg.warmup_steps, run_cfg.total_steps,
        )
        self._schedule = schedule
        decay = (decay_everything if run_cfg.decay_policy == "all"
                 else decay_except_embeddings)
        self.optimizer = make_optimizer(
            params, schedule, weight_decay=run_cfg.weight_decay,
            grad_clip=run_cfg.grad_clip, decay_predicate=decay,
        )
        self.state = TrainState.create(params, self.optimizer)
        if zero2:
            # moments/grads shard over fsdp even though params replicate:
            # re-place the freshly-initialized opt state with the full
            # (ZeRO-3) rules — opt-state leaf paths end with the param
            # path, so the same rule table matches
            from ..parallel.sharding import param_shardings as _ps

            self.state = dataclasses.replace(
                self.state,
                opt_state=jax.device_put(
                    self.state.opt_state,
                    _ps(self.state.opt_state, self.mesh, rules=rules),
                ),
            )
        state_memory_shardings = None
        if run_cfg.host_offload_params:
            from jax.sharding import NamedSharding, PartitionSpec

            def mesh_sharding(x):
                # optax count scalars come back single-device-committed;
                # normalize everything onto the mesh (replicated) so the
                # jitted step sees one device set
                s = getattr(x, "sharding", None)
                if isinstance(s, jax.sharding.NamedSharding):
                    return s
                return NamedSharding(self.mesh, PartitionSpec())

            dev = jax.tree.map(mesh_sharding, self.state)
            host = jax.tree.map(
                lambda s: s.with_memory_kind("pinned_host"), dev
            )
            state_memory_shardings = (dev, host)
            self.state = jax.device_put(self.state, host)
        self.ckpt = CheckpointManager(
            run_cfg.run_dir, keep_last=run_cfg.keep_last_checkpoints
        )
        self.epoch = 0

        # auto-resume (train.py:288-298); sft_scratch loads weights but
        # resets counters (instruction_finetune.py:109-116)
        if run_cfg.training_mode in ("resume", "sft_resume"):
            self.state, self.epoch = self.ckpt.restore(self.state)
        elif run_cfg.training_mode == "sft_scratch":
            restored, _ = self.ckpt.restore(self.state)
            self.state = dataclasses.replace(
                restored, step=jnp.zeros((), jnp.int32),
                opt_state=self.optimizer.init(restored.params),
            )
        if run_cfg.frozen_bf16 and run_cfg.training_mode != "scratch":
            # restore merges by shape, not dtype — a checkpoint carrying
            # fp32 frozen leaves (imported run dirs save the SigLIP tower
            # fp32) would silently undo the bf16 storage on resume
            from .optim import cast_frozen_to

            self.state = dataclasses.replace(
                self.state, params=cast_frozen_to(self.state.params)
            )

        self.step_fn = jax.jit(
            make_train_step(
                model_cfg, self.optimizer, policy=self.policy,
                remat=run_cfg.remat, grad_accum=run_cfg.grad_accum,
                accum_unroll=run_cfg.accum_unroll,
                order=run_cfg.order, host_offload=run_cfg.host_offload,
                sp_mesh=sp_mesh, pp_mesh=pp_mesh,
                pp_microbatches=run_cfg.pp_microbatches,
                moe_aux_weight=run_cfg.moe_aux_weight, ep_mesh=ep_mesh,
                grad_shardings=grad_shardings,
                param_shardings=param_out_shardings,
            ),
            donate_argnums=(0,),
        )
        if state_memory_shardings is not None:
            # params + optimizer state live in PINNED HOST between steps
            # (reference CPUOffload(offload_params=True)); residency moves
            # around the jit — memory-kind-annotated jit outputs are not
            # supported on every XLA backend
            dev_tree, host_tree = state_memory_shardings
            inner = self.step_fn

            def offloaded_step(state, batch):
                state = jax.device_put(state, dev_tree)
                new_state, m = inner(state, batch)
                return jax.device_put(new_state, host_tree), m

            self.step_fn = offloaded_step
        self.metrics = MetricsLogger(run_cfg.run_dir, is_main=self.is_main)
        self._bsharding = batch_sharding(
            self.mesh, stacked=run_cfg.grad_accum > 1
        )

    def put_batch(self, np_batch) -> Batch:
        if isinstance(np_batch, tuple):
            # multi-dataset step: one batch per dataset (train_utils.py:215)
            return tuple(self.put_batch(b) for b in np_batch)
        lw = getattr(np_batch, "loss_weight", 1.0)
        if lw is None:   # Batch-typed inputs carry None for "no multiplier"
            lw = 1.0
        batch = Batch(
            input_ids=np_batch.input_ids, images=np_batch.images,
            attn_valid=np_batch.attn_valid, labels=np_batch.labels,
        )
        batch = jax.device_put(batch, self._bsharding)
        if lw != 1.0:
            # scalar multiplier replicates (can't ride the batch axes).
            # Under grad accumulation the batch tree is lax.scan xs, so
            # every leaf needs the leading microbatch axis — broadcast the
            # (per-dataset-constant) multiplier to (grad_accum,).
            from ..parallel.mesh import replicated

            w = jnp.asarray(lw, jnp.float32)
            if self.cfg.grad_accum > 1:
                w = jnp.full((self.cfg.grad_accum,), w)
            batch = dataclasses.replace(
                batch,
                loss_weight=jax.device_put(w, replicated(self.mesh)),
            )
        return batch

    @staticmethod
    def _stack_micro(group):
        """Stack ``grad_accum`` consecutive loader batches into ONE tree
        with a leading microbatch axis — the layout
        ``make_train_step(grad_accum=n)`` scans/unrolls over. Multi-dataset
        tuples stack per element; the per-dataset ``loss_weight`` is a
        constant, so the first batch's value stands for the group."""
        import numpy as np

        if isinstance(group[0], tuple):
            return tuple(
                Trainer._stack_micro([g[i] for g in group])
                for i in range(len(group[0]))
            )
        return Batch(
            input_ids=np.stack([b.input_ids for b in group]),
            images=np.stack([b.images for b in group]),
            attn_valid=np.stack([b.attn_valid for b in group]),
            labels=np.stack([b.labels for b in group]),
            loss_weight=getattr(group[0], "loss_weight", None),
        )

    def run_epoch(self, batch_iter: Iterator, epoch: int) -> int:
        """Run one epoch; returns global step. Stops at total_steps.

        With ``grad_accum > 1`` the loop consumes that many consecutive
        loader batches per optimizer step (reference semantics: the
        accumulation factor multiplies data consumed, not batch size); a
        trailing partial group is dropped like a partial batch would be.
        """
        cfg = self.cfg
        if cfg.grad_accum > 1:
            def grouped(it=batch_iter, n=cfg.grad_accum):
                buf = []
                for b in it:
                    buf.append(b)
                    if len(buf) == n:
                        yield self._stack_micro(buf)
                        buf = []
            batch_iter = grouped()
        step_time = AverageMeter()
        data_time = AverageMeter()
        t_end = time.perf_counter()
        for np_batch in batch_iter:
            step = int(self.state.step)
            if step >= cfg.total_steps:
                break
            data_time.update(time.perf_counter() - t_end)
            batch = self.put_batch(np_batch)
            self.state, m = self.step_fn(self.state, batch)
            step += 1
            if step % cfg.log_every == 0:
                # host sync only at log boundaries
                loss = float(m["loss"])
                self.metrics.log(
                    step,
                    training_loss=loss,
                    learning_rate=float(self._schedule(step)),
                    grad_norm=float(m["grad_norm"]),
                    step_time=step_time.avg,
                    data_time=data_time.avg,
                )
            if step % cfg.checkpoint_steps == 0:
                # EVERY process enters save: orbax's sharded-array write is
                # a collective (each host writes its shards; rank-0-only
                # would deadlock a multi-host mesh). The reference's rank-0
                # torch.save gather (train_utils.py:413-461) has no analogue
                # here — is_main only guards logging and GC.
                self.ckpt.save(self.state, epoch=epoch, step=step)
            step_time.update(time.perf_counter() - t_end)
            t_end = time.perf_counter()
        return int(self.state.step)

    def finish(self, epoch: int):
        # all processes: orbax save is collective (see run_epoch)
        self.ckpt.save(self.state, epoch=epoch, step=int(self.state.step))
        self.metrics.close()
