"""ZeRO-2 (SHARD_GRAD_OP) and param host-offload: numerics must match the
full-shard baseline, and the placements must actually differ.

Reference flag surface: ``train/distributed.py:193-210`` — sharding
strategies full/grad_op/hybrid/no_shard and ``CPUOffload(offload_params)``.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aki_tpu.models.configs import aki_tiny
from aki_tpu.train.runner import RunnerConfig, Trainer
from aki_tpu.parallel.mesh import MeshConfig
from aki_tpu.train.step import Batch

pytestmark = pytest.mark.collective

CFG = aki_tiny()


def make_batch(rng, b=8, t=16):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    labels = ids.copy()
    labels[:, :9] = -100
    s = CFG.siglip.image_size
    return Batch(
        input_ids=jnp.array(ids),
        images=jnp.array(rng.randn(b, s, s, 3).astype(np.float32)),
        attn_valid=jnp.ones((b, t), jnp.int32),
        labels=jnp.array(labels),
    )


def run_steps(tmp_path, tag, **kw):
    cfg = RunnerConfig(
        run_dir=str(tmp_path / tag), total_steps=3, warmup_steps=1,
        learning_rate=1e-3, grad_clip=1.0, precision="fp32", remat=False,
        checkpoint_steps=10_000, log_every=100,
        mesh=MeshConfig(data=1, fsdp=8, tensor=1), **kw,
    )
    tr = Trainer(CFG, cfg)
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(3):
        batch = tr.put_batch(make_batch(rng))
        tr.state, m = tr.step_fn(tr.state, batch)
        losses.append(float(m["loss"]))
    wq_arr = tr.state.params["phi3"]["layers"]["wq"]
    if wq_arr.sharding.memory_kind != "device":
        wq_arr = jax.device_put(
            wq_arr, wq_arr.sharding.with_memory_kind("device")
        )
    wq = np.asarray(jax.device_get(wq_arr), np.float32)
    return losses, wq, tr


def test_zero2_matches_full_shard(tmp_path):
    l_full, wq_full, _ = run_steps(tmp_path, "full", fsdp_strategy="full")
    l_z2, wq_z2, tr = run_steps(tmp_path, "grad_op", fsdp_strategy="grad_op")

    np.testing.assert_allclose(l_full, l_z2, rtol=1e-5)
    np.testing.assert_allclose(wq_full, wq_z2, rtol=1e-5, atol=1e-6)

    # placements: params replicate over fsdp, Adam moments shard over it
    wq = tr.state.params["phi3"]["layers"]["wq"]
    assert all(p != "fsdp" for p in (wq.sharding.spec or ()) if p)
    mus = [
        leaf for path, leaf in
        jax.tree_util.tree_leaves_with_path(tr.state.opt_state)
        if ".mu" in jax.tree_util.keystr(path)
        and hasattr(leaf, "sharding") and leaf.ndim >= 2
    ]
    assert mus, "no Adam moments found in opt state"
    assert any(
        "fsdp" in str(m.sharding.spec) for m in mus
    ), [str(m.sharding.spec) for m in mus[:4]]


def test_host_offload_params_matches(tmp_path):
    l_full, wq_full, _ = run_steps(tmp_path, "full2", fsdp_strategy="full")
    l_off, wq_off, tr = run_steps(
        tmp_path, "offload", host_offload_params=True
    )
    np.testing.assert_allclose(l_full, l_off, rtol=1e-5)
    np.testing.assert_allclose(wq_full, wq_off, rtol=1e-5, atol=1e-6)
    wq = tr.state.params["phi3"]["layers"]["wq"]
    assert wq.sharding.memory_kind == "pinned_host"


def test_bad_strategy_raises(tmp_path):
    with pytest.raises(ValueError, match="fsdp_strategy"):
        run_steps(tmp_path, "bad", fsdp_strategy="zero9000")
