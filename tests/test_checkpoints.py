"""Checkpoint manager: save/restore/filter/GC/latents-reinit semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from aki_tpu.models.aki import init_aki
from aki_tpu.models.configs import aki_tiny
from aki_tpu.train.checkpoints import CheckpointManager, split_frozen
from aki_tpu.train.step import TrainState

CFG = aki_tiny()


def make_state(seed=0):
    params = init_aki(jax.random.PRNGKey(seed), CFG)
    opt = optax.adamw(1e-3)
    return TrainState.create(params, opt), opt


def test_save_restore_roundtrip(tmp_path):
    state, opt = make_state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state, epoch=0, step=10)

    fresh, _ = make_state(seed=1)
    restored, epoch = mgr.restore(fresh)
    assert epoch == 0
    np.testing.assert_array_equal(
        np.asarray(restored.params["phi3"]["layers"]["wq"]),
        np.asarray(state.params["phi3"]["layers"]["wq"]),
    )
    # frozen encoder is NOT in the checkpoint: stays at fresh init
    np.testing.assert_array_equal(
        np.asarray(restored.params["siglip"]["pos_embed"]),
        np.asarray(fresh.params["siglip"]["pos_embed"]),
    )
    assert int(restored.step) == int(state.step)


def test_latest_selection_and_gc(tmp_path):
    state, _ = make_state()
    mgr = CheckpointManager(str(tmp_path), keep_last=2)
    mgr.save(state, epoch=0, step=5)
    mgr.save(state, epoch=0, step=10)
    mgr.save(state, epoch=1, step=15)
    cks = mgr.list_checkpoints()
    assert len(cks) == 2  # GC kept last 2
    assert mgr.latest().name == "checkpoint_1_15"


def test_frozen_filter():
    state, _ = make_state()
    savable, frozen = split_frozen(state.params)
    assert "siglip" not in savable
    assert "phi3" in savable and "extra_embed" in savable
    assert list(frozen) == ["siglip"]


def test_latents_shape_mismatch_reinit(tmp_path):
    """Reference re-inits resampler latents on shape mismatch
    (train_utils.py:346-349)."""
    state, _ = make_state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state, epoch=0, step=1)

    import dataclasses as dc
    from aki_tpu.models.configs import PerceiverConfig, AKIConfig
    from aki_tpu.models.perceiver import init_perceiver

    # fresh model with MORE latents
    p2 = dict(state.params)
    bigger = dc.replace(CFG.perceiver, num_latents=CFG.perceiver.num_latents + 2)
    p2["perceiver"] = init_perceiver(jax.random.PRNGKey(9), bigger)
    opt = optax.adamw(1e-3)
    fresh = TrainState.create(p2, opt)

    restored, _ = mgr.restore(fresh)
    # mismatched latents keep the fresh init shape/values
    assert restored.params["perceiver"]["latents"].shape[0] == bigger.num_latents
    np.testing.assert_array_equal(
        np.asarray(restored.params["perceiver"]["latents"]),
        np.asarray(p2["perceiver"]["latents"]),
    )
    # matched tensors still restore
    np.testing.assert_array_equal(
        np.asarray(restored.params["phi3"]["layers"]["wq"]),
        np.asarray(state.params["phi3"]["layers"]["wq"]),
    )


def test_restore_without_checkpoint_returns_init(tmp_path):
    state, _ = make_state()
    mgr = CheckpointManager(str(tmp_path))
    restored, epoch = mgr.restore(state)
    assert restored is state and epoch == 0


def test_include_frozen_roundtrip(tmp_path):
    """An imported run dir (save(include_frozen=True)) must carry the
    SigLIP tower and restore it VERBATIM — the plain training-checkpoint
    path drops it, and before round 5 `convert.cli.import_checkpoint`
    used that path, silently serving a random vision tower to every
    downstream consumer (eval/demo load_params, AKIModel.from_pretrained).
    """
    state, _ = make_state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state, epoch=0, step=10, include_frozen=True)

    fresh, _ = make_state(seed=1)
    # sanity: the two inits genuinely differ in the frozen tower
    assert not np.array_equal(
        np.asarray(fresh.params["siglip"]["pos_embed"]),
        np.asarray(state.params["siglip"]["pos_embed"]),
    )
    restored, _ = mgr.restore(fresh)
    np.testing.assert_array_equal(
        np.asarray(restored.params["siglip"]["pos_embed"]),
        np.asarray(state.params["siglip"]["pos_embed"]),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.params["phi3"]["layers"]["wq"]),
        np.asarray(state.params["phi3"]["layers"]["wq"]),
    )
