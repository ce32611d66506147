"""Sequence parallelism: the seq-sharded step matches the unsharded one.

The reference has no SP (SURVEY §5 long-context: absent — sequences are
short); aki_tpu ships it as the long-context hook: decoder activations
shard along T via one GSPMD constraint, attention runs in a shard_map that
all-gathers K/V over the ``seq`` axis with per-shard absolute q offsets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.ops.attention import dense_attention
from aki_tpu.ops.flash_mma import flash_mma_attention_sp
from aki_tpu.ops.masks import MMASpec
from aki_tpu.parallel.mesh import MeshConfig, batch_sharding, create_mesh
from aki_tpu.parallel.sharding import shard_params
from aki_tpu.train.step import Batch, TrainState, make_train_step

pytestmark = pytest.mark.collective

CFG = aki_tiny()


def test_sp_kernel_matches_dense():
    """flash_mma_attention_sp over a 4-way seq mesh == dense oracle."""
    mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=1, seq=4))
    rng = np.random.RandomState(0)
    b, t, h, d = 2, 32, 2, 16
    q = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    spec = MMASpec(
        img_start=jnp.array([[2], [0]], jnp.int32),
        txt_start=jnp.array([[8], [6]], jnp.int32),
        txt_end=jnp.array([[20], [25]], jnp.int32),
    )
    kv_valid = jnp.asarray(
        (np.arange(t)[None] < np.array([[28], [32]])).astype(np.int32))

    got = flash_mma_attention_sp(
        q, k, v, mesh=mesh, spec=spec, kv_valid=kv_valid,
        block_q=128, block_kv=128,
    )
    want = dense_attention(q, k, v, spec=spec, kv_valid=kv_valid)
    np.testing.assert_allclose(
        np.asarray(got)[:, :28], np.asarray(want)[:, :28],
        rtol=2e-4, atol=2e-4,
    )


def _ring_setup():
    mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=1, seq=4))
    rng = np.random.RandomState(0)
    b, t, h, d = 2, 32, 2, 16
    q = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    spec = MMASpec(
        img_start=jnp.array([[2], [0]], jnp.int32),
        txt_start=jnp.array([[8], [6]], jnp.int32),
        # row 0's MMA rectangle spans shards 1-2 of the seq=4 ring —
        # exercises vision rows reaching a FUTURE block via the predicate
        txt_end=jnp.array([[20], [25]], jnp.int32),
    )
    kv_valid = jnp.asarray(
        (np.arange(t)[None] < np.array([[28], [32]])).astype(np.int32))
    return mesh, q, k, v, spec, kv_valid


def test_ring_sp_matches_dense():
    """ring_mma_attention_sp (K/V sharded, ppermute ring) == dense."""
    from aki_tpu.ops.ring_attention import ring_mma_attention_sp

    mesh, q, k, v, spec, kv_valid = _ring_setup()
    got = ring_mma_attention_sp(q, k, v, mesh=mesh, spec=spec,
                                kv_valid=kv_valid)
    want = dense_attention(q, k, v, spec=spec, kv_valid=kv_valid)
    np.testing.assert_allclose(
        np.asarray(got)[:, :28], np.asarray(want)[:, :28],
        rtol=2e-4, atol=2e-4,
    )


def test_ring_sp_grads_match_dense():
    """The reverse ring (custom_vjp) produces dense-oracle gradients for
    q, k, AND v — dk/dv must land back on their home shards."""
    from aki_tpu.ops.ring_attention import ring_mma_attention_sp

    mesh, q, k, v, spec, kv_valid = _ring_setup()
    rng = np.random.RandomState(7)
    # cotangent restricted to valid rows (padded-row grads are undefined)
    gmask = jnp.asarray((np.arange(32)[None, :, None, None] < 28)
                        .astype(np.float32))
    w = jnp.asarray(rng.randn(*q.shape).astype(np.float32)) * gmask

    def ring_loss(q, k, v):
        out = ring_mma_attention_sp(q, k, v, mesh=mesh, spec=spec,
                                    kv_valid=kv_valid)
        return jnp.sum(out * w)

    def dense_loss(q, k, v):
        return jnp.sum(dense_attention(q, k, v, spec=spec,
                                       kv_valid=kv_valid) * w)

    got = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for name, g, wgt in zip("qkv", got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wgt), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_ring_sp_never_gathers_kv():
    """Structural memory claim: the ring's HLO contains collective-permute
    but NO all-gather — per-device KV stays O(T / n_seq)."""
    from aki_tpu.ops.ring_attention import ring_mma_attention_sp

    mesh, q, k, v, spec, kv_valid = _ring_setup()
    hlo = (
        jax.jit(lambda q, k, v: ring_mma_attention_sp(
            q, k, v, mesh=mesh, spec=spec, kv_valid=kv_valid))
        .lower(q, k, v).compile().as_text()
    )
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def make_batch(rng, b=8, t=19):
    # t_full = t + num_latents - 1 = 24: divisible by seq in {2, 4, 8}
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


SP_MESHES = [
    ("dp2_sp4", MeshConfig(data=2, fsdp=1, tensor=1, seq=4)),
    ("fsdp2_tp2_sp2", MeshConfig(data=1, fsdp=2, tensor=2, seq=2)),
]


@pytest.mark.parametrize("name,mesh_cfg", SP_MESHES)
def test_sp_step_matches_unsharded(name, mesh_cfg):
    params0 = init_aki(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    batch0 = make_batch(rng)
    opt = optax.sgd(1e-2)

    def baseline():
        state = TrainState.create(jax.tree.map(jnp.copy, params0), opt)
        step = jax.jit(make_train_step(CFG, opt, policy=F32, use_flash=False))
        state, m = step(state, batch0)
        return float(m["loss"]), np.asarray(state.params["phi3"]["layers"]["wq"])

    def sp_run(mesh_cfg):
        mesh = create_mesh(mesh_cfg)
        params = shard_params(jax.tree.map(jnp.copy, params0), mesh)
        state = TrainState.create(params, opt)
        batch = jax.device_put(batch0, batch_sharding(mesh))
        step = jax.jit(make_train_step(
            CFG, opt, policy=F32, use_flash=False, sp_mesh=mesh))
        state, m = step(state, batch)
        return float(m["loss"]), np.asarray(state.params["phi3"]["layers"]["wq"])

    ref_loss, ref_wq = baseline()
    loss, wq = sp_run(mesh_cfg)
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-4, err_msg=name)
    np.testing.assert_allclose(wq, ref_wq, rtol=1e-3, atol=1e-5, err_msg=name)
