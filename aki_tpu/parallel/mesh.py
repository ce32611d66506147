"""Device mesh over ICI/DCN and multi-host init.

The reference's distributed runtime (``train/distributed.py``) discovers
ranks from env (torchrun/SLURM/OMPI) and builds NCCL process groups with
DDP/FSDP wrappers.  The TPU-native equivalent is declarative: one
``jax.sharding.Mesh`` with named axes and GSPMD/pjit inserting collectives.

Axes (SURVEY §2.6 mapping):

- ``data``   — pure data parallelism (DDP ≙ replicated params, batch split);
- ``fsdp``   — ZeRO-3-style parameter sharding along the batch direction
               (FSDP FULL_SHARD ≙ fsdp = all devices, data = 1);
- ``tensor`` — megatron-style tensor parallelism of the decoder (absent in
               the reference but first-class here so the Phi-3 decoder can
               scale within a slice);
- ``seq``    — sequence parallelism: decoder activations shard along T,
               attention all-gathers K/V over the axis (long-context hook —
               absent in the reference per SURVEY §5, first-class here);
- ``pipe``   — pipeline parallelism: decoder layers split into stages,
               microbatch activations flow stage-to-stage over ppermute
               (``parallel/pipeline.py``);
- ``expert`` — expert parallelism for MoE layers (``models/moe.py``):
               expert weights and the dispatched (E, capacity, D) token
               buffers shard over the axis; GSPMD inserts the all-to-alls.

HYBRID_SHARD (shard intra-node, replicate inter-node,
``distributed.py:195-196``) is ``data`` = number of slices (DCN) x ``fsdp``
= devices per slice (ICI): pass ``data_on_dcn=True`` on multi-slice.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"
AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS, SEQ_AXIS, PIPE_AXIS, EXPERT_AXIS)

BATCH_AXES = (DATA_AXIS, FSDP_AXIS)  # activation batch dim spans both


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """-1 means "absorb remaining devices" (exactly one axis may be -1)."""

    data: int = 1
    fsdp: int = -1
    tensor: int = 1
    seq: int = 1
    pipe: int = 1
    expert: int = 1
    data_on_dcn: bool = False   # put the data axis on DCN (hybrid shard)


def resolve_axis_sizes(cfg: MeshConfig, n_devices: int) -> tuple[int, ...]:
    sizes = [cfg.data, cfg.fsdp, cfg.tensor, cfg.seq, cfg.pipe, cfg.expert]
    n_auto = sum(1 for s in sizes if s == -1)
    if n_auto > 1:
        raise ValueError("at most one mesh axis may be -1")
    fixed = int(np.prod([s for s in sizes if s != -1]))
    if n_auto == 1:
        if n_devices % fixed != 0:
            raise ValueError(f"{n_devices} devices not divisible by {fixed}")
        sizes = [n_devices // fixed if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) > n_devices:
        raise ValueError(f"mesh {sizes} needs more than {n_devices} devices")
    return tuple(sizes)


def create_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    sizes = resolve_axis_sizes(cfg, len(devices))
    # sub-mesh: explicit sizes smaller than the host's device count use the
    # first prod(sizes) devices (debug runs on a big host)
    devices = devices[: int(np.prod(sizes))]
    if cfg.data_on_dcn and getattr(devices[0], "slice_index", None) is not None:
        # data axis outermost => maps across slices (DCN); the rest ride ICI
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1,) + tuple(sizes[1:]),
            dcn_mesh_shape=(sizes[0],) + (1,) * (len(sizes) - 1),
            devices=devices,
        )
    else:
        # single-slice (or CPU-sim) fallback: data axis outermost still puts
        # replicas on the coarsest interconnect dimension
        dev_array = mesh_utils.create_device_mesh(sizes, devices=devices)
    return Mesh(dev_array, AXES)


def init_distributed() -> None:
    """Multi-host init (reference ``init_distributed_device``,
    ``distributed.py:74-134``).  No-op on single host; JAX TPU pods discover
    topology from the runtime, so explicit coordinator env vars are only
    needed off-TPU."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def batch_sharding(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """Sharding for a batch array. ``stacked=True`` is the grad-accum
    layout: a leading microbatch axis stays replicated, the batch axis
    (now axis 1) shards over the data axes."""
    if stacked:
        return NamedSharding(mesh, PartitionSpec(None, BATCH_AXES))
    return NamedSharding(mesh, PartitionSpec(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
