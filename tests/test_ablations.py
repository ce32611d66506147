"""Attention-mode ablations on one kernel: causal vs DOT vs MMA (config #3),
plus the pretrain -> sft_scratch training-mode flow."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.models.aki import aki_forward, init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny

CFG = aki_tiny()


def make_inputs(rng, b=1, t=14):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return jnp.array(ids), jnp.array(valid), jnp.array(imgs)


def test_three_modes_differ():
    """MMA, causal (DOT-style reorder), and forced-causal-mask produce
    distinct next-token logits from identical inputs/weights."""
    rng = np.random.RandomState(0)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    ids, valid, imgs = make_inputs(rng)

    mma = aki_forward(params, CFG, ids, imgs, valid, policy=F32,
                      use_flash=False, order="image_first")
    dot = aki_forward(params, CFG, ids, imgs, valid, policy=F32,
                      use_flash=False, order="text_first")

    # causal ablation: same splice as MMA but the block zeroed
    from aki_tpu.models.aki import embed_text, encode_vision, lm_logits
    from aki_tpu.models.fusion import splice_vision_tokens
    from aki_tpu.models.phi3 import phi3_forward
    from aki_tpu.ops.masks import causal_spec

    vt = encode_vision(params, CFG, imgs, F32)
    te = embed_text(params, CFG, ids, F32)
    sp = splice_vision_tokens(te, vt, ids, valid, CFG.media_token_id,
                              CFG.assistant_token_id)
    hidden, _ = phi3_forward(params["phi3"], CFG.phi3, sp.embeds, sp.positions,
                             spec=causal_spec(1), kv_valid=sp.attn_valid,
                             policy=F32, use_flash=False)
    causal_logits = np.asarray(lm_logits(params, CFG, hidden, F32))[0, -1]

    mma_last = np.asarray(mma.logits)[0, -1]
    dot_last = np.asarray(dot.logits)[0, -1]
    assert np.abs(mma_last - causal_logits).max() > 1e-6
    assert np.abs(mma_last - dot_last).max() > 1e-6
    # last position is past txt_end in all modes -> finite logits everywhere
    for arr in (mma_last, dot_last, causal_logits):
        assert np.isfinite(arr).all()


def test_pretrain_then_sft_scratch_flow(tmp_path):
    """training_mode=sft_scratch loads pretrain weights but resets step and
    optimizer state (instruction_finetune.py:109-116)."""
    import optax
    from aki_tpu.parallel.mesh import MeshConfig
    from aki_tpu.train.checkpoints import CheckpointManager
    from aki_tpu.train.runner import RunnerConfig, Trainer
    from aki_tpu.train.step import TrainState

    # fake a finished pretrain run at step 77
    params = init_aki(jax.random.PRNGKey(1), CFG)
    state = TrainState.create(params, optax.adamw(1e-3))
    state = type(state)(params=state.params, opt_state=state.opt_state,
                        step=jnp.asarray(77, jnp.int32))
    CheckpointManager(str(tmp_path)).save(state, epoch=2, step=77)

    run_cfg = RunnerConfig(
        run_dir=str(tmp_path), training_mode="sft_scratch",
        mesh=MeshConfig(data=1, fsdp=1, tensor=1), precision="fp32",
        total_steps=10, warmup_steps=1,
    )
    tr = Trainer(CFG, run_cfg)
    assert int(tr.state.step) == 0  # counters reset
    np.testing.assert_allclose(  # weights loaded
        np.asarray(tr.state.params["phi3"]["layers"]["wq"]),
        np.asarray(params["phi3"]["layers"]["wq"]),
    )

    # sft_resume keeps the counter
    run_cfg2 = RunnerConfig(
        run_dir=str(tmp_path), training_mode="sft_resume",
        mesh=MeshConfig(data=1, fsdp=1, tensor=1), precision="fp32",
        total_steps=10, warmup_steps=1,
    )
    tr2 = Trainer(CFG, run_cfg2)
    assert int(tr2.state.step) == 77
    assert tr2.epoch == 2


def test_loss_multiplier_scales_gradients():
    import optax
    from aki_tpu.train.step import Batch, TrainState, make_train_step

    rng = np.random.RandomState(2)
    params = init_aki(jax.random.PRNGKey(3), CFG)
    ids, valid, imgs = make_inputs(rng, b=2)
    labels = np.asarray(ids).copy()
    base = Batch(input_ids=ids, images=imgs, attn_valid=valid,
                 labels=jnp.array(labels))
    weighted = Batch(input_ids=ids, images=imgs, attn_valid=valid,
                     labels=jnp.array(labels),
                     loss_weight=jnp.asarray(2.0, jnp.float32))

    opt = optax.sgd(1e-2)
    step = jax.jit(make_train_step(CFG, opt, policy=F32, use_flash=False))
    _, m1 = step(TrainState.create(params, opt), base)
    _, m2 = step(TrainState.create(params, opt), weighted)
    np.testing.assert_allclose(float(m2["loss"]), 2 * float(m1["loss"]),
                               rtol=1e-5)
