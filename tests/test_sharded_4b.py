"""AKI-4B-geometry scale-realism checks on the virtual 8-device mesh:
per-device HBM budget for the sharded train state, and checkpoint
save-on-mesh-A / restore-on-mesh-B."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aki_tpu.models.aki import init_aki
from aki_tpu.models.configs import aki_4b, aki_tiny
from aki_tpu.parallel.mesh import MeshConfig, create_mesh
from aki_tpu.parallel.sharding import param_shardings, shard_params

pytestmark = pytest.mark.collective

V5E_HBM = 16 * 1024 ** 3


def _per_device_bytes(shapes, shardings) -> int:
    """Max per-device bytes of a sharded tree (from abstract shapes)."""
    total = 0
    for leaf, sh in zip(jax.tree.leaves(shapes), jax.tree.leaves(shardings)):
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        factor = 1
        for part, dim in zip(sh.spec, leaf.shape):
            if part is None:
                continue
            names = part if isinstance(part, tuple) else (part,)
            size = 1
            for n in names:
                size *= sh.mesh.shape[n]
            factor *= size
        total += nbytes // factor
    return total


def test_aki4b_sharded_train_state_fits_v5e_hbm():
    """Abstract (eval_shape) accounting of the fp32 AdamW train state at
    the full AKI-4B geometry, sharded fsdp=8: master params + 2 moments +
    transient fp32 grads + an activation envelope must fit a 16 GB v5e.

    No 4B materialization — shapes only."""
    cfg = aki_4b()
    shapes = jax.eval_shape(
        lambda k: init_aki(k, cfg), jax.random.PRNGKey(0)
    )
    mesh = create_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    shardings = param_shardings(shapes, mesh)

    params_b = _per_device_bytes(shapes, shardings)
    # AdamW mu+nu over trainable (everything but the frozen vision tower)
    trainable = {k: v for k, v in shapes.items() if k != "siglip"}
    tr_shard = {k: shardings[k] for k in trainable}
    opt_b = 2 * _per_device_bytes(trainable, tr_shard)
    grads_b = _per_device_bytes(trainable, tr_shard)  # transient fp32

    # activation envelope at SFT bs16 x ~655 spliced tokens with per-layer
    # remat: boundary activations + flash workspaces, sharded over the
    # batch axes; generous 2 GB headroom
    activations_b = 2 * 1024 ** 3

    total = params_b + opt_b + grads_b + activations_b
    assert total < 0.9 * V5E_HBM, (
        f"per-device estimate {total / 1e9:.1f} GB exceeds v5e HBM: "
        f"params {params_b / 1e9:.1f} + opt {opt_b / 1e9:.1f} + "
        f"grads {grads_b / 1e9:.1f} + act 2.0"
    )
    # sanity: the sharding actually splits the big tensors (a replicated
    # 4B fp32 state would be ~64 GB/device)
    assert params_b < 6 * 1024 ** 3


def test_checkpoint_cross_topology_restore(tmp_path):
    """Save sharded on mesh A (fsdp4 x tp2), restore on mesh B
    (dp2 x fsdp2 x tp2): values must match and the restored leaves must
    carry mesh-B shardings."""
    import optax

    from aki_tpu.train.checkpoints import CheckpointManager
    from aki_tpu.train.step import TrainState

    cfg = aki_tiny()
    mesh_a = create_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    params_a = shard_params(init_aki(jax.random.PRNGKey(0), cfg), mesh_a)
    opt = optax.adamw(1e-3)
    state_a = TrainState.create(params_a, opt)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state_a, epoch=1, step=7)

    mesh_b = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    params_b = shard_params(init_aki(jax.random.PRNGKey(99), cfg), mesh_b)
    state_b = TrainState.create(params_b, opt)
    restored, epoch = mgr.restore(state_b)
    # state_a carried step 0 (the step=7 kwarg only names the checkpoint)
    assert epoch == 1
    assert int(restored.step) == 0
    # values come from the mesh-A checkpoint
    np.testing.assert_allclose(
        np.asarray(restored.params["phi3"]["layers"]["wq"]),
        np.asarray(params_a["phi3"]["layers"]["wq"]),
        rtol=1e-6,
    )
    # placement follows mesh B
    got_sh = restored.params["phi3"]["layers"]["wq"].sharding
    want_sh = state_b.params["phi3"]["layers"]["wq"].sharding
    assert got_sh == want_sh, (got_sh, want_sh)
    assert got_sh.mesh.shape == mesh_b.shape

    # and the restored state steps on mesh B
    from aki_tpu.train.step import Batch, make_train_step
    from aki_tpu.models.common import F32
    from aki_tpu.parallel.mesh import batch_sharding

    rng = np.random.RandomState(0)
    b, t = 8, 12
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = cfg.media_token_id
    valid = np.ones((b, t), np.int32)
    labels = np.where(valid == 1, ids, -100)
    s = cfg.siglip.image_size
    batch = jax.device_put(
        Batch(input_ids=jnp.array(ids),
              images=jnp.array(rng.randn(b, s, s, 3).astype(np.float32)),
              attn_valid=jnp.array(valid), labels=jnp.array(labels)),
        batch_sharding(mesh_b),
    )
    step = jax.jit(make_train_step(cfg, opt, policy=F32, remat=False,
                                   use_flash=False), donate_argnums=(0,))
    new_state, m = step(restored, batch)
    assert np.isfinite(float(m["loss"]))


def test_aki4b_train_step_lowers_on_8dev_mesh():
    """Trace + lower (no compile, no materialization) the FULL AKI-4B
    train step with dp1 x fsdp8 shardings on the virtual 8-device mesh —
    catches sharding-propagation errors at the real geometry."""
    import optax

    from aki_tpu.train.step import Batch, TrainState, make_train_step

    cfg = aki_4b()
    key = jax.random.PRNGKey(0)
    param_shapes = jax.eval_shape(lambda k: init_aki(k, cfg), key)
    mesh = create_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    shardings = param_shardings(param_shapes, mesh)

    opt = optax.adamw(1e-4)
    state_shapes = jax.eval_shape(
        lambda p: TrainState.create(p, opt), param_shapes
    )

    def annotate(tree, shard_tree=None):
        # attach shardings to the abstract avals where we have them
        if shard_tree is None:
            return tree
        return jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            tree, shard_tree,
        )

    state_abs = TrainState(
        params=annotate(state_shapes.params, shardings),
        opt_state=state_shapes.opt_state,
        step=state_shapes.step,
    )
    b, t = 16, 512
    s = cfg.siglip.image_size
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P(("data", "fsdp")))
    batch_abs = Batch(
        input_ids=jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=bsh),
        images=jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32, sharding=bsh),
        attn_valid=jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=bsh),
        labels=jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=bsh),
    )
    step = make_train_step(cfg, opt, remat=True, use_flash=False)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(state_abs, batch_abs)
    assert lowered is not None
    text = lowered.as_text()
    assert "dot" in text  # sanity: a real compute graph came out


def _abstract_4b_lowering(mesh, t, **step_kw):
    """Shared scaffolding: lower the 4B train step abstractly on ``mesh``."""
    import optax

    from aki_tpu.train.step import Batch, TrainState, make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = aki_4b()
    rules = step_kw.pop("rules", None)
    param_shapes = jax.eval_shape(
        lambda k: init_aki(k, cfg), jax.random.PRNGKey(0)
    )
    shardings = param_shardings(param_shapes, mesh, rules=rules)
    opt = optax.adamw(1e-4)
    state_shapes = jax.eval_shape(
        lambda p: TrainState.create(p, opt), param_shapes
    )
    params_abs = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shapes.params, shardings,
    )
    state_abs = TrainState(
        params=params_abs, opt_state=state_shapes.opt_state,
        step=state_shapes.step,
    )
    b = 16
    s = cfg.siglip.image_size
    bsh = NamedSharding(mesh, P(("data", "fsdp")))
    batch_abs = Batch(
        input_ids=jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=bsh),
        images=jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32, sharding=bsh),
        attn_valid=jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=bsh),
        labels=jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=bsh),
    )
    step = make_train_step(cfg, opt, remat=True, use_flash=False, **step_kw)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(state_abs, batch_abs)
    assert lowered is not None and "dot" in lowered.as_text()


def test_aki4b_sp_train_step_lowers_on_8dev_mesh():
    """4B geometry, sequence-parallel: fsdp4 x seq2. t=513 makes the
    spliced length 656 divide the seq axis."""
    mesh = create_mesh(MeshConfig(data=1, fsdp=4, tensor=1, seq=2))
    _abstract_4b_lowering(mesh, t=513, sp_mesh=mesh)


def test_aki4b_pp_train_step_lowers_on_8dev_mesh():
    """4B geometry, pipeline-parallel: pipe=8 (4 layers/stage), 8
    microbatches of 2."""
    from aki_tpu.parallel.pipeline import pp_param_rules

    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=1, pipe=8))
    _abstract_4b_lowering(
        mesh, t=512, pp_mesh=mesh, pp_microbatches=8,
        rules=pp_param_rules(),
    )
