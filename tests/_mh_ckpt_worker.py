"""Worker for the 2-process distributed checkpoint test.

Launched by tests/test_multihost_ckpt.py as two separate processes that
form one jax.distributed job over 8 virtual CPU devices (4 per process).
Each process builds fsdp-sharded state, BOTH call CheckpointManager.save
(the orbax sharded write is a collective — this is exactly what the
rank-0-only gate used to deadlock), then both restore and verify values.

Reference semantics being replaced: rank-0 gather + torch.save + barrier
(``train/train_utils.py:413-461``).
"""

import os
import sys

port, pid, tmpdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aki_tpu.train.checkpoints import CheckpointManager  # noqa: E402
from aki_tpu.train.step import TrainState  # noqa: E402

assert len(jax.devices()) == 8, jax.devices()
mesh = Mesh(np.array(jax.devices()).reshape(8), ("fsdp",))
shard = NamedSharding(mesh, P("fsdp"))
rep = NamedSharding(mesh, P())

w = jax.device_put(np.arange(8 * 16, dtype=np.float32).reshape(8, 16), shard)
b = jax.device_put(np.full((16,), 3.5, np.float32), rep)
params = {"dense": {"w": w, "b": b}}
opt_state = {"mu": jax.tree.map(lambda x: x * 0.1, params)}
state = TrainState(params=params, opt_state=opt_state,
                   step=jnp.asarray(7, jnp.int32))

ckpt = CheckpointManager(tmpdir, keep_last=2)
# BOTH processes enter save — the collective contract under test
ckpt.save(state, epoch=1, step=7)

# restore into a zeroed template with the same shardings (build zeros from
# shape/dtype — np.zeros_like would fetch non-addressable shards)
def zero_like(x):
    return jax.device_put(np.zeros(x.shape, x.dtype), x.sharding)


fresh = TrainState(
    params=jax.tree.map(zero_like, params),
    opt_state=jax.tree.map(zero_like, opt_state),
    step=jnp.asarray(0, jnp.int32),
)
restored, epoch = ckpt.restore(fresh)
assert epoch == 1
assert int(restored.step) == 7

full_w = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)


def check(arr, expect):
    """Compare the process-local shards (the global array spans both
    processes and cannot be fetched whole)."""
    for s in arr.addressable_shards:
        np.testing.assert_allclose(np.asarray(s.data), expect[s.index])


check(restored.params["dense"]["w"], full_w)
check(restored.params["dense"]["b"], np.full((16,), 3.5, np.float32))
check(restored.opt_state["mu"]["dense"]["w"], full_w * 0.1)
print(f"proc {pid} OK", flush=True)
