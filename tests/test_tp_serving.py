"""Tensor-parallel serving: the flash MMA kernel under shard_map.

Heads shard over the `tensor` axis with zero collectives (attention is
embarrassingly parallel over heads); the qkv projections already produce
tensor-sharded values under GSPMD, so the shard_map in_specs match the
data in place. Run on the virtual 8-device mesh with the kernel in
interpret mode — the same code path a v5e pod serves with.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import generate, prefill
from aki_tpu.models.aki import aki_forward, init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.parallel.mesh import MeshConfig, batch_sharding, create_mesh
from aki_tpu.parallel.sharding import shard_params

pytestmark = pytest.mark.collective

CFG = aki_tiny()


def _batch(rng, b=2, t=14):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return ids, imgs, valid


def test_tp_flash_prefill_matches_single_device():
    rng = np.random.RandomState(0)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    ids, imgs, valid = _batch(rng)

    # single-device oracle (dense attention)
    want = aki_forward(params, CFG, jnp.array(ids), jnp.array(imgs),
                       jnp.array(valid), policy=F32, use_flash=False)

    mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    sharded = shard_params(params, mesh)
    with mesh:
        got = jax.jit(
            lambda p, i, im, v: aki_forward(
                p, CFG, i, im, v, policy=F32, use_flash=True, tp_mesh=mesh,
            ).logits
        )(sharded, jnp.array(ids), jnp.array(imgs), jnp.array(valid))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want.logits), rtol=2e-4, atol=2e-4,
    )


def test_tp_generate_matches_single_device_tokens():
    rng = np.random.RandomState(1)
    params = init_aki(jax.random.PRNGKey(1), CFG)
    ids, imgs, valid = _batch(rng, b=2)

    toks_1d, _ = generate(
        params, CFG, jnp.array(ids), jnp.array(imgs), jnp.array(valid),
        max_new_tokens=5, max_len=48, policy=F32, use_flash=False,
    )

    mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    sharded = shard_params(params, mesh)
    with mesh:
        toks_tp, _ = generate(
            sharded, CFG, jnp.array(ids), jnp.array(imgs), jnp.array(valid),
            max_new_tokens=5, max_len=48, policy=F32, use_flash=True,
            tp_mesh=mesh,
        )
    np.testing.assert_array_equal(np.asarray(toks_tp), np.asarray(toks_1d))


def test_tp_serving_engine_matches_single_device():
    """Continuous-batching `ServingEngine` over a tensor axis: params shard
    per the megatron rules, the slot KV cache shards over heads, and the
    greedy tokens match the unsharded one-shot engine exactly."""
    from aki_tpu.infer.engine import generate as oneshot_generate
    from aki_tpu.infer.server import ServingEngine

    params = init_aki(jax.random.PRNGKey(3), CFG)
    mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    engine = ServingEngine(params, CFG, num_slots=2, max_len=48,
                           prompt_bucket=12, policy=F32, tp_mesh=mesh)

    reqs, prompts = [], []
    for i in range(3):  # more requests than slots -> slot reuse under TP
        rng = np.random.RandomState(300 + i)
        ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(12,))
        ids[1] = CFG.media_token_id
        ids[8] = CFG.assistant_token_id
        s = CFG.siglip.image_size
        img = rng.randn(s, s, 3).astype(np.float32)
        prompts.append((list(ids), img))
        reqs.append(engine.submit(list(ids), img, max_new_tokens=4))
    engine.run_until_drained()

    for (ids, img), req in zip(prompts, reqs):
        got = req.result(timeout=1)
        want, _ = oneshot_generate(
            params, CFG, jnp.array([ids], jnp.int32), jnp.array(img[None]),
            jnp.ones((1, len(ids)), jnp.int32), max_new_tokens=4, max_len=48,
            policy=F32, use_flash=False,
        )
        assert got == list(np.asarray(want)[0]), (got, np.asarray(want)[0])


def test_tp_serving_engine_kv_int8():
    """TP + int8 slot cache: the flat (L, slots, S, Hkv*D) int8 buffers
    shard on their last (head-major) dim; admission scatter and the fused
    decode run under GSPMD propagation. Tokens match the unsharded int8
    server (same quantization, so exact)."""
    from aki_tpu.infer.server import ServingEngine

    params = init_aki(jax.random.PRNGKey(4), CFG)

    def run(tp_mesh):
        eng = ServingEngine(params, CFG, num_slots=2, max_len=48,
                            prompt_bucket=12, policy=F32, kv_int8=True,
                            tp_mesh=tp_mesh)
        out = []
        for i in range(2):
            rng = np.random.RandomState(400 + i)
            ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(12,))
            ids[1] = CFG.media_token_id
            ids[8] = CFG.assistant_token_id
            s = CFG.siglip.image_size
            img = rng.randn(s, s, 3).astype(np.float32)
            out.append(eng.submit(list(ids), img, max_new_tokens=4))
        eng.run_until_drained()
        return [r.result(timeout=1) for r in out]

    mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    assert run(mesh) == run(None)


def test_tp_prefill_state_is_head_sharded():
    """The KV cache coming out of a TP prefill carries head-sharded (or at
    least mesh-placed) buffers — no silent full replication of the cache."""
    rng = np.random.RandomState(2)
    params = init_aki(jax.random.PRNGKey(2), CFG)
    ids, imgs, valid = _batch(rng, b=2)
    mesh = create_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    sharded = shard_params(params, mesh)
    with mesh:
        state = jax.jit(
            lambda p, i, im, v: prefill(
                p, CFG, i, im, v, max_len=48, policy=F32,
                use_flash=True, tp_mesh=mesh,
            )
        )(sharded, jnp.array(ids), jnp.array(imgs), jnp.array(valid))
    assert state.cache.k.shape[0] == CFG.phi3.num_layers
    assert np.isfinite(np.asarray(state.last_logits, np.float32)).all()
