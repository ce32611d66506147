"""Prefill/decode token parity vs full-sequence forward (no cache).

This is the engine's core contract (SURVEY §3.3): greedy decode over the
MMA-prefilled KV cache must produce the same tokens as re-running the whole
growing sequence through the model each step.
"""

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import decode_step, generate, prefill
from aki_tpu.infer.sampling import SamplingConfig
from aki_tpu.models.aki import aki_forward, encode_vision
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny

CFG = aki_tiny()


def make_prompt(rng, b=1, t=12):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return jnp.array(ids), jnp.array(valid), jnp.array(imgs)


def naive_greedy(params, ids, imgs, valid, steps):
    """Oracle: full re-forward each step, greedy pick at last position."""
    out_tokens = []
    cur_ids, cur_valid = np.asarray(ids), np.asarray(valid)
    for _ in range(steps):
        o = aki_forward(params, CFG, jnp.array(cur_ids), imgs,
                        jnp.array(cur_valid), policy=F32, use_flash=False)
        tok = int(jnp.argmax(o.logits[0, -1]))
        out_tokens.append(tok)
        cur_ids = np.concatenate([cur_ids, [[tok]]], axis=1)
        cur_valid = np.concatenate([cur_valid, [[1]]], axis=1)
    return out_tokens


def test_prefill_decode_token_parity():
    rng = np.random.RandomState(0)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    ids, valid, imgs = make_prompt(rng)
    steps = 6

    want = naive_greedy(params, ids, imgs, valid, steps)

    tokens, num = generate(
        params, CFG, ids, imgs, valid, max_new_tokens=steps,
        max_len=64, policy=F32, use_flash=False,
    )
    got = list(np.asarray(tokens)[0])
    assert got == want, f"{got} != {want}"


def test_prefill_last_logits_match_forward():
    rng = np.random.RandomState(1)
    params = init_aki(jax.random.PRNGKey(1), CFG)
    ids, valid, imgs = make_prompt(rng)
    st = prefill(params, CFG, ids, imgs, valid, max_len=48, policy=F32,
                 use_flash=False)
    o = aki_forward(params, CFG, ids, imgs, valid, policy=F32, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(st.last_logits[0]), np.asarray(o.logits[0, -1]),
        rtol=2e-4, atol=2e-4,
    )


def test_batched_generation_right_padded():
    """Batched decode with different prompt lengths (right padding)."""
    rng = np.random.RandomState(2)
    params = init_aki(jax.random.PRNGKey(2), CFG)
    b, t = 2, 12
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[0, 8] = CFG.assistant_token_id
    ids[1, 6] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    valid[1, 8:] = 0  # row 1 is shorter
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)

    tokens, _ = generate(
        params, CFG, jnp.array(ids), jnp.array(imgs), jnp.array(valid),
        max_new_tokens=4, max_len=48, policy=F32, use_flash=False,
    )
    # each row must match its own single-sample generation
    for i in range(b):
        ti, _ = generate(
            params, CFG, jnp.array(ids[i:i + 1]), jnp.array(imgs[i:i + 1]),
            jnp.array(valid[i:i + 1]), max_new_tokens=4, max_len=48,
            policy=F32, use_flash=False,
        )
        np.testing.assert_array_equal(np.asarray(tokens)[i], np.asarray(ti)[0])


def test_eos_stops_row():
    rng = np.random.RandomState(3)
    params = init_aki(jax.random.PRNGKey(3), CFG)
    ids, valid, imgs = make_prompt(rng)
    # find the first greedily generated token and use it as "eos"
    st = prefill(params, CFG, ids, imgs, valid, max_len=48, policy=F32,
                 use_flash=False)
    eos = int(jnp.argmax(st.last_logits[0]))
    tokens, num = generate(
        params, CFG, ids, imgs, valid, max_new_tokens=5, max_len=48,
        eos_id=eos, policy=F32, use_flash=False,
    )
    toks = np.asarray(tokens)[0]
    assert toks[0] == eos
    assert int(num[0]) == 1
    assert np.all(toks[1:] == CFG.pad_token_id)


def test_sampling_determinism_and_spread():
    rng = np.random.RandomState(4)
    params = init_aki(jax.random.PRNGKey(4), CFG)
    ids, valid, imgs = make_prompt(rng)
    cfgs = SamplingConfig(temperature=1.0, top_k=8)
    t1, _ = generate(params, CFG, ids, imgs, valid, max_new_tokens=6,
                     max_len=48, sampling=cfgs, rng=jax.random.PRNGKey(7),
                     policy=F32, use_flash=False)
    t2, _ = generate(params, CFG, ids, imgs, valid, max_new_tokens=6,
                     max_len=48, sampling=cfgs, rng=jax.random.PRNGKey(7),
                     policy=F32, use_flash=False)
    t3, _ = generate(params, CFG, ids, imgs, valid, max_new_tokens=6,
                     max_len=48, sampling=cfgs, rng=jax.random.PRNGKey(8),
                     policy=F32, use_flash=False)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))
