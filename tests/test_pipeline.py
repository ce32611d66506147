"""Pipeline parallelism: the staged decoder matches the plain one.

GPipe-over-shard_map (``parallel/pipeline.py``): layers sharded by stage
along the ``pipe`` axis, microbatch payloads flowing via ppermute. The
reference has no PP (SURVEY §2.6) — these tests pin the staged forward,
loss, and one-optimizer-step update to the unsharded baseline.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.parallel.mesh import MeshConfig, batch_sharding, create_mesh
from aki_tpu.parallel.pipeline import pp_param_rules
from aki_tpu.parallel.sharding import shard_params
from aki_tpu.train.step import Batch, TrainState, make_train_step

pytestmark = pytest.mark.collective

CFG = aki_tiny()


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


PP_MESHES = [
    # (name, mesh config, microbatches)
    ("pp2", MeshConfig(data=1, fsdp=1, tensor=1, pipe=2), 2),
    ("pp2_m4", MeshConfig(data=1, fsdp=1, tensor=1, pipe=2), 4),
    ("dp2_pp2", MeshConfig(data=2, fsdp=1, tensor=1, pipe=2), 2),
    # stage-internal FSDP: weights shard over fsdp inside each stage and
    # all-gather just-in-time per layer (pipeline v2)
    ("fsdp2_pp2", MeshConfig(data=1, fsdp=2, tensor=1, pipe=2), 2),
    ("dp2_fsdp2_pp2", MeshConfig(data=2, fsdp=2, tensor=1, pipe=2), 2),
]


def test_trainer_activates_sp_and_pp_from_mesh_config(tmp_path):
    """mesh: {seq: N} / {pipe: N} in a run config must activate the sp/pp
    code paths (regression: the Trainer used to ignore the new axes and
    run replicated redundant work)."""
    from aki_tpu.train.runner import RunnerConfig, Trainer

    class _Np:
        pass

    def batch_of(t):
        rng = np.random.RandomState(0)
        b = make_batch(rng, b=8, t=t)
        nb = _Np()
        nb.input_ids, nb.images = np.asarray(b.input_ids), np.asarray(b.images)
        nb.attn_valid, nb.labels = np.asarray(b.attn_valid), np.asarray(b.labels)
        return nb

    # pipe=2: layer params must be stage-sharded and one epoch must step
    tr = Trainer(CFG, RunnerConfig(
        run_dir=str(tmp_path / "pp"), precision="fp32", remat=False,
        total_steps=1, warmup_steps=1, checkpoint_steps=10,
        mesh=MeshConfig(data=2, fsdp=1, tensor=1, pipe=2),
        pp_microbatches=2,
    ))
    wq_spec = tr.state.params["phi3"]["layers"]["wq"].sharding.spec
    assert "pipe" in str(wq_spec), wq_spec
    steps = tr.run_epoch(iter([batch_of(16)]), epoch=0)
    assert steps == 1

    # seq=4: one epoch must step with the sp attention path
    tr2 = Trainer(CFG, RunnerConfig(
        run_dir=str(tmp_path / "sp"), precision="fp32", remat=False,
        total_steps=1, warmup_steps=1, checkpoint_steps=10,
        mesh=MeshConfig(data=2, fsdp=1, tensor=1, seq=4),
    ))
    steps = tr2.run_epoch(iter([batch_of(19)]), epoch=0)
    assert steps == 1


@pytest.mark.parametrize("name,mesh_cfg,m", PP_MESHES)
def test_pp_step_matches_unsharded(name, mesh_cfg, m):
    params0 = init_aki(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    batch0 = make_batch(rng)
    opt = optax.sgd(1e-2)

    def baseline():
        state = TrainState.create(jax.tree.map(jnp.copy, params0), opt)
        step = jax.jit(make_train_step(CFG, opt, policy=F32, use_flash=False))
        state, metrics = step(state, batch0)
        return (float(metrics["loss"]),
                np.asarray(state.params["phi3"]["layers"]["wq"]))

    def pp_run():
        mesh = create_mesh(mesh_cfg)
        params = shard_params(
            jax.tree.map(jnp.copy, params0), mesh, rules=pp_param_rules()
        )
        state = TrainState.create(params, opt)
        batch = jax.device_put(batch0, batch_sharding(mesh))
        step = jax.jit(make_train_step(
            CFG, opt, policy=F32, use_flash=False,
            pp_mesh=mesh, pp_microbatches=m,
        ))
        state, metrics = step(state, batch)
        return (float(metrics["loss"]),
                np.asarray(state.params["phi3"]["layers"]["wq"]))

    ref_loss, ref_wq = baseline()
    loss, wq = pp_run()
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-4, err_msg=name)
    np.testing.assert_allclose(wq, ref_wq, rtol=1e-3, atol=1e-5, err_msg=name)


def test_pp_moe_aux_matches_unsharded():
    """MoE decoder through the pipeline: the Switch aux loss flows with the
    microbatch payload and the total (CE + weighted aux) matches the
    unpipelined MoE step (pipeline v2; v1 silently dropped aux)."""
    import dataclasses

    from aki_tpu.models.configs import MoEConfig

    cfg = dataclasses.replace(
        CFG, phi3=dataclasses.replace(
            CFG.phi3,
            moe=MoEConfig(num_experts=4, top_k=2, intermediate_size=32,
                          capacity_factor=2.0),
        ),
    )
    params0 = init_aki(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch0 = make_batch(rng)
    opt = optax.sgd(1e-2)

    def baseline():
        state = TrainState.create(jax.tree.map(jnp.copy, params0), opt)
        step = jax.jit(make_train_step(cfg, opt, policy=F32, use_flash=False,
                                       moe_aux_weight=0.05))
        state, metrics = step(state, batch0)
        return (float(metrics["loss"]),
                np.asarray(state.params["phi3"]["layers"]["moe"]["w_gate"]))

    def pp_run():
        mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=1, pipe=2))
        params = shard_params(
            jax.tree.map(jnp.copy, params0), mesh, rules=pp_param_rules()
        )
        state = TrainState.create(params, opt)
        batch = jax.device_put(batch0, batch_sharding(mesh))
        step = jax.jit(make_train_step(
            cfg, opt, policy=F32, use_flash=False,
            pp_mesh=mesh, pp_microbatches=2, moe_aux_weight=0.05,
        ))
        state, metrics = step(state, batch)
        return (float(metrics["loss"]),
                np.asarray(state.params["phi3"]["layers"]["moe"]["w_gate"]))

    ref_loss, ref_w = baseline()
    loss, w = pp_run()
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-4)
    np.testing.assert_allclose(w, ref_w, rtol=1e-3, atol=1e-5)


def test_pp_config_errors_are_valueerrors():
    """User-reachable config mistakes raise ValueError (not bare asserts
    that vanish under python -O)."""
    from aki_tpu.models.common import F32 as F32p
    from aki_tpu.parallel.pipeline import phi3_forward_pp

    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=4, pipe=2))
    x = jnp.zeros((4, 8, CFG.phi3.hidden_size))
    pos = jnp.zeros((4, 8), jnp.int32)
    params = init_aki(jax.random.PRNGKey(0), CFG)["phi3"]
    with pytest.raises(ValueError, match="tensor"):
        phi3_forward_pp(params, CFG.phi3, x, pos, None,
                        jnp.ones((4, 8), jnp.int32), mesh)
    mesh2 = create_mesh(MeshConfig(data=1, fsdp=1, tensor=1, pipe=2))
    with pytest.raises(ValueError, match="microbatches"):
        phi3_forward_pp(params, CFG.phi3, x[:3], pos[:3], None,
                        jnp.ones((3, 8), jnp.int32), mesh2,
                        num_microbatches=2)
