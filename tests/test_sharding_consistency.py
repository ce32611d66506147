"""Parallelism correctness: the same step on different meshes must produce
identical losses and parameter updates (GSPMD collectives are an
implementation detail, never semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.parallel.mesh import MeshConfig, batch_sharding, create_mesh
from aki_tpu.parallel.sharding import shard_params
from aki_tpu.train.step import Batch, TrainState, make_train_step

pytestmark = pytest.mark.collective

CFG = aki_tiny()

MESHES = [
    ("dp8", MeshConfig(data=8, fsdp=1, tensor=1)),
    ("fsdp8", MeshConfig(data=1, fsdp=8, tensor=1)),
    ("dp2_fsdp2_tp2", MeshConfig(data=2, fsdp=2, tensor=2)),
    ("tp4_fsdp2", MeshConfig(data=1, fsdp=2, tensor=4)),
]


def make_batch(rng, b=8, t=16):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    labels = ids.copy()
    labels[:, :9] = -100
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return Batch(
        input_ids=jnp.array(ids), images=jnp.array(imgs),
        attn_valid=jnp.array(valid), labels=jnp.array(labels),
    )


@pytest.mark.parametrize("name,mesh_cfg", MESHES)
def test_step_invariant_across_meshes(name, mesh_cfg):
    params0 = init_aki(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    batch0 = make_batch(rng)
    opt = optax.sgd(1e-2)

    def run(mesh_cfg):
        mesh = create_mesh(mesh_cfg)
        params = shard_params(
            jax.tree.map(jnp.copy, params0), mesh
        )
        state = TrainState.create(params, opt)
        batch = jax.device_put(batch0, batch_sharding(mesh))
        step = jax.jit(make_train_step(CFG, opt, policy=F32, use_flash=False))
        state, m = step(state, batch)
        return float(m["loss"]), np.asarray(state.params["phi3"]["layers"]["wq"])

    ref_loss, ref_wq = run(MeshConfig(data=1, fsdp=1, tensor=1))
    loss, wq = run(mesh_cfg)
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5, err_msg=name)
    np.testing.assert_allclose(wq, ref_wq, rtol=1e-4, atol=1e-6, err_msg=name)
