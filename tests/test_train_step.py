"""Train step + sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.parallel.mesh import MeshConfig, batch_sharding, create_mesh
from aki_tpu.parallel.sharding import param_shardings, shard_params
from aki_tpu.train.optim import make_optimizer
from aki_tpu.train.schedules import cosine_min_lr, make_schedule
from aki_tpu.train.step import Batch, TrainState, make_train_step

pytestmark = pytest.mark.collective

CFG = aki_tiny()


def make_batch(rng, b=8, t=16, accum=None):
    def one():
        ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
        ids[:, 1] = CFG.media_token_id
        ids[:, 8] = CFG.assistant_token_id
        valid = np.ones((b, t), np.int32)
        labels = ids.copy()
        labels[:, :9] = -100
        s = CFG.siglip.image_size
        imgs = rng.randn(b, s, s, 3).astype(np.float32)
        return ids, valid, labels, imgs

    if accum is None:
        ids, valid, labels, imgs = one()
        return Batch(
            input_ids=jnp.array(ids), images=jnp.array(imgs),
            attn_valid=jnp.array(valid), labels=jnp.array(labels),
        )
    parts = [one() for _ in range(accum)]
    return Batch(
        input_ids=jnp.array(np.stack([p[0] for p in parts])),
        images=jnp.array(np.stack([p[3] for p in parts])),
        attn_valid=jnp.array(np.stack([p[1] for p in parts])),
        labels=jnp.array(np.stack([p[2] for p in parts])),
    )


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    shape = dict(mesh.shape)
    assert (shape["data"], shape["fsdp"], shape["tensor"]) == (2, 2, 2)
    assert all(shape[a] == 1 for a in ("seq", "pipe", "expert"))
    mesh = create_mesh(MeshConfig(data=1, fsdp=-1, tensor=1))
    assert mesh.shape["fsdp"] == 8


def test_param_shardings_follow_rules():
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    params = init_aki(jax.random.PRNGKey(0), CFG)
    sh = param_shardings(params, mesh)
    # wq: (L, d, nh*dh) -> P(None, fsdp, tensor)
    assert sh["phi3"]["layers"]["wq"].spec == jax.sharding.PartitionSpec(
        None, "fsdp", "tensor"
    )
    # norm scales replicate
    assert sh["phi3"]["final_norm"]["scale"].spec == jax.sharding.PartitionSpec()
    # indivisible dims fall back to replication rather than erroring
    placed = shard_params(params, mesh)
    assert placed["phi3"]["layers"]["wq"].sharding.is_fully_replicated is False


def test_train_step_loss_decreases_and_frozen_stays():
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    params = init_aki(jax.random.PRNGKey(0), CFG)
    params = shard_params(params, mesh)
    opt = make_optimizer(params, learning_rate=3e-3, weight_decay=0.0)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(CFG, opt, policy=F32, remat=True,
                                   use_flash=False), donate_argnums=(0,))

    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    batch = jax.device_put(batch, batch_sharding(mesh))

    sig_before = np.asarray(
        jax.tree.leaves(jax.tree.map(jnp.sum, state.params["siglip"]))
    ).sum()
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    sig_after = np.asarray(
        jax.tree.leaves(jax.tree.map(jnp.sum, state.params["siglip"]))
    ).sum()
    assert sig_before == sig_after  # frozen encoder untouched
    assert int(state.step) == 5


def test_grad_accum_matches_big_batch():
    params = init_aki(jax.random.PRNGKey(1), CFG)
    opt = optax.sgd(1e-2)  # linear optimizer => exact equivalence

    rng = np.random.RandomState(1)
    big = make_batch(rng, b=4, t=12)

    micro = Batch(
        input_ids=big.input_ids.reshape(2, 2, -1),
        images=big.images.reshape(2, 2, *big.images.shape[1:]),
        attn_valid=big.attn_valid.reshape(2, 2, -1),
        labels=big.labels.reshape(2, 2, -1),
    )

    # no donation here: both states alias the same param buffers
    s1 = TrainState.create(params, opt)
    step1 = jax.jit(make_train_step(CFG, opt, policy=F32, use_flash=False))
    s1, m1 = step1(s1, big)

    s2 = TrainState.create(params, opt)
    step2 = jax.jit(make_train_step(CFG, opt, policy=F32, use_flash=False,
                                    grad_accum=2))
    s2, m2 = step2(s2, micro)

    # unrolled accumulation (the HBM-tight variant — the scan form
    # double-buffers the carried grad tree, see step.py) must match too
    s3 = TrainState.create(params, opt)
    step3 = jax.jit(make_train_step(CFG, opt, policy=F32, use_flash=False,
                                    grad_accum=2, accum_unroll=True))
    s3, m3 = step3(s3, micro)

    # each microbatch has uniform token counts -> mean-of-means == mean
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["loss"]), float(m3["loss"]), rtol=1e-5)
    a = np.asarray(s1.params["phi3"]["layers"]["wq"])
    b = np.asarray(s2.params["phi3"]["layers"]["wq"])
    c = np.asarray(s3.params["phi3"]["layers"]["wq"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)


def test_runner_grad_accum_groups_loader_batches(tmp_path):
    """grad_accum>1 consumes that many consecutive loader batches per
    optimizer step (runner-side stacking — the YAML
    gradient_accumulation_steps knob's contract)."""
    from aki_tpu.train.runner import RunnerConfig, Trainer

    from aki_tpu.parallel.mesh import MeshConfig as MC

    rc = RunnerConfig(run_dir=str(tmp_path / "r"), grad_accum=2,
                      precision="fp32", total_steps=10, log_every=1,
                      checkpoint_steps=1000,
                      mesh=MC(data=2, fsdp=2, tensor=2))
    tr = Trainer(CFG, rc)
    rng = np.random.RandomState(0)
    batches = [make_batch(rng, b=4, t=12) for _ in range(5)]
    step = tr.run_epoch(iter(batches), epoch=0)
    # 5 loader batches -> 2 accum-2 steps; the trailing partial drops
    assert step == 2
    tr.metrics.close()


def test_schedules():
    sch = cosine_min_lr(1e-3, 1e-5, warmup_steps=10, total_steps=110)
    assert float(sch(0)) == 0.0
    np.testing.assert_allclose(float(sch(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sch(110)), 1e-5, rtol=1e-4)
    lin = make_schedule("linear", 1e-3, 0.0, 10, 110)
    np.testing.assert_allclose(float(lin(60)), 5e-4, rtol=1e-5)
    const = make_schedule("constant", 1e-3, 0.0, 10, 110)
    np.testing.assert_allclose(float(const(1000)), 1e-3, rtol=1e-6)
    with pytest.raises(ValueError):
        make_schedule("bogus", 1e-3, 0.0, 10, 110)


def test_weight_decay_mask():
    """decay_except_embeddings must not decay embed tables."""
    from aki_tpu.train.optim import decay_except_embeddings, path_mask

    params = init_aki(jax.random.PRNGKey(2), CFG)
    mask = path_mask(params, decay_except_embeddings)
    assert mask["phi3"]["embed"]["table"] is False
    assert mask["extra_embed"]["table"] is False
    assert mask["phi3"]["layers"]["wq"] is True


def test_multi_dataset_step_sums_weighted_grads():
    """Reference semantics (train_utils.py:215-252): one optimizer step
    consumes one batch per dataset; grads = sum over datasets of
    grad(loss_d * weight_d) — no division by the dataset count."""
    import dataclasses

    import optax

    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import F32
    from aki_tpu.models.configs import aki_tiny
    from aki_tpu.train.step import Batch, TrainState, make_train_step

    cfg = aki_tiny()
    params = init_aki(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(1.0)  # transparent update: delta == -grads
    state = TrainState.create(params, opt)

    rng = np.random.RandomState(0)

    def mk_batch(b, t, w, seed):
        r = np.random.RandomState(seed)
        ids = r.randint(5, cfg.initial_tokenizer_len - 1, size=(b, t))
        ids[:, 1] = cfg.media_token_id
        valid = np.ones((b, t), np.int32)
        labels = np.where(valid == 1, ids, -100)
        s = cfg.siglip.image_size
        imgs = r.randn(b, s, s, 3).astype(np.float32)
        return Batch(
            input_ids=jnp.array(ids), images=jnp.array(imgs),
            attn_valid=jnp.array(valid), labels=jnp.array(labels),
            loss_weight=jnp.asarray(w, jnp.float32),
        )

    # different shapes per dataset, like per-dataset batch_size/max_text_len
    b1 = mk_batch(2, 12, 1.0, 1)
    b2 = mk_batch(3, 10, 0.25, 2)

    step = make_train_step(cfg, opt, policy=F32, remat=False,
                           use_flash=False)
    new_state, m = jax.jit(step)(state, (b1, b2))

    # oracle: sum of per-dataset weighted grads, one SGD update
    from aki_tpu.train.step import make_loss_fn

    loss_fn = make_loss_fn(cfg, F32, False, False)
    g1 = jax.grad(loss_fn)(params, b1)
    g2 = jax.grad(loss_fn)(params, b2)
    want = jax.tree.map(lambda p, a, b_: p - (a + b_), params, g1, g2)
    got_leaf = np.asarray(new_state.params["phi3"]["layers"]["wq"])
    want_leaf = np.asarray(want["phi3"]["layers"]["wq"])
    np.testing.assert_allclose(got_leaf, want_leaf, rtol=2e-5, atol=2e-5)
    assert np.isfinite(float(m["loss"]))


def test_host_offload_step_runs_or_unsupported():
    """offload_to_cpu analogue: saved activations go to pinned_host via the
    remat offload policy. Runs where the backend supports host memory
    kinds; otherwise asserts the structured failure (TPU supports it)."""
    import optax

    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import F32
    from aki_tpu.models.configs import aki_tiny
    from aki_tpu.train.step import Batch, TrainState, make_train_step

    cfg = aki_tiny()
    params = init_aki(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(0.1)
    state = TrainState.create(params, opt)
    r = np.random.RandomState(0)
    b, t = 2, 12
    ids = r.randint(5, cfg.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = cfg.media_token_id
    valid = np.ones((b, t), np.int32)
    s = cfg.siglip.image_size
    batch = Batch(
        input_ids=jnp.array(ids),
        images=jnp.array(r.randn(b, s, s, 3).astype(np.float32)),
        attn_valid=jnp.array(valid),
        labels=jnp.array(np.where(valid == 1, ids, -100)),
    )
    step = make_train_step(cfg, opt, policy=F32, remat=False,
                           use_flash=False, host_offload=True)
    try:
        _, m = jax.jit(step)(state, batch)
        assert np.isfinite(float(m["loss"]))
    except Exception as e:  # noqa: BLE001 — CPU backends may lack the kind
        assert "pinned_host" in str(e) or "memory" in str(e).lower(), e


def test_frozen_bf16_storage_bit_identical_loss():
    """cast_frozen_to: bf16-stored frozen SigLIP gives a BIT-identical loss
    under bf16 compute (fp32 master -> bf16 cast per step == bf16 stored
    once), while freeing half the frozen bytes. Round-5 train-memory lever
    (PERF.md): depth-4 bs-12 went from OOM to fitting."""
    from aki_tpu.models.common import Policy
    from aki_tpu.train.optim import cast_frozen_to

    params = init_aki(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    cast = cast_frozen_to(params)
    # frozen subtree is bf16, trainable subtrees keep fp32 masters
    assert all(a.dtype == jnp.bfloat16
               for a in jax.tree.leaves(cast["siglip"])
               if jnp.issubdtype(a.dtype, jnp.floating))
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(cast["phi3"])
               if jnp.issubdtype(a.dtype, jnp.floating))

    rng = np.random.RandomState(0)
    batch = make_batch(rng, b=2)
    bf16 = Policy()  # fp32 params, bf16 compute
    opt = make_optimizer(params, learning_rate=1e-3)
    step = jax.jit(make_train_step(CFG, opt, policy=bf16, use_flash=False))
    _, m_fp32 = step(TrainState.create(params, opt), batch)
    _, m_bf16 = step(TrainState.create(cast, opt), batch)
    assert float(m_fp32["loss"]) == float(m_bf16["loss"])


def test_remat_nowide_policy_identical_loss(monkeypatch):
    """AKI_REMAT_POLICY=dots_nowide is a memory/time knob ONLY — the saved
    vs recomputed split must not change a single bit of the loss."""
    from aki_tpu.models import phi3 as phi3_mod

    params = init_aki(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(params, learning_rate=1e-3)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, b=2)

    losses = {}
    for mode in ("dots", "dots_nowide"):
        monkeypatch.setenv("AKI_REMAT_POLICY", mode)
        step = jax.jit(
            make_train_step(CFG, opt, policy=F32, remat=True,
                            use_flash=False))
        _, m = step(TrainState.create(params, opt), batch)
        losses[mode] = float(m["loss"])
    assert losses["dots"] == losses["dots_nowide"], losses
