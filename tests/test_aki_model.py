"""End-to-end AKI model tests on the tiny config."""

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.models.aki import (
    aki_forward, embed_text, encode_vision, init_aki, next_token_loss,
)
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny

CFG = aki_tiny()


def make_inputs(rng, b=2, t=16):
    v = CFG.initial_tokenizer_len
    ids = rng.randint(5, v - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    valid[:, -2:] = 0
    labels = ids.copy()
    labels[:, :9] = -100
    labels[valid == 0] = -100
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return jnp.array(ids), jnp.array(valid), jnp.array(labels), jnp.array(imgs)


def test_forward_shapes_and_loss():
    rng = np.random.RandomState(0)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    ids, valid, labels, imgs = make_inputs(rng)
    out = aki_forward(params, CFG, ids, imgs, valid, labels=labels,
                      policy=F32, use_flash=False)
    b, t = ids.shape
    t_full = t + CFG.perceiver.num_latents - 1
    assert out.logits.shape == (b, t_full, CFG.output_vocab)
    assert np.isfinite(float(out.loss))
    # vision span labels ignored
    i0 = int(out.spliced.spec.img_start[0])
    assert np.all(np.asarray(out.spliced.labels)[0, i0:i0 + CFG.perceiver.num_latents] == -100)


def test_mma_vision_tokens_see_question():
    """Changing a question token changes hidden states at vision positions
    under MMA but not under DOT/causal ordering of the same tokens."""
    rng = np.random.RandomState(1)
    params = init_aki(jax.random.PRNGKey(1), CFG)
    ids, valid, labels, imgs = make_inputs(rng, b=1)
    ids2 = np.asarray(ids).copy()
    ids2[0, 5] = 7  # change a question token (between image and assistant)
    ids2 = jnp.array(ids2)

    out1 = aki_forward(params, CFG, ids, imgs, valid, policy=F32, use_flash=False)
    out2 = aki_forward(params, CFG, ids2, imgs, valid, policy=F32, use_flash=False)
    i0 = int(out1.spliced.spec.img_start[0])
    i1 = int(out1.spliced.spec.txt_start[0])
    l1 = np.asarray(out1.logits)[0, i0:i1]
    l2 = np.asarray(out2.logits)[0, i0:i1]
    assert np.abs(l1 - l2).max() > 1e-6  # MMA: vision rows saw the question

    # pre-image logits must be identical (causality preserved)
    p1 = np.asarray(out1.logits)[0, :i0]
    p2 = np.asarray(out2.logits)[0, :i0]
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_frozen_vision_encoder_gets_no_grad():
    rng = np.random.RandomState(2)
    params = init_aki(jax.random.PRNGKey(2), CFG)
    ids, valid, labels, imgs = make_inputs(rng, b=1)

    def loss_fn(p):
        return aki_forward(p, CFG, ids, imgs, valid, labels=labels,
                           policy=F32, use_flash=False).loss

    grads = jax.grad(loss_fn)(params)
    sig_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["siglip"])
    )
    perc_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["perceiver"])
    )
    assert sig_norm == 0.0          # stop_gradient (vlm.py:199 no_grad)
    assert perc_norm > 0.0          # perceiver trains


def test_decoupled_embedding_routing():
    params = init_aki(jax.random.PRNGKey(3), CFG)
    base_id = 5
    extra_id = CFG.media_token_id  # == initial_tokenizer_len
    ids = jnp.array([[base_id, extra_id]])
    emb = np.asarray(embed_text(params, CFG, ids, policy=F32))
    np.testing.assert_allclose(
        emb[0, 0], np.asarray(params["phi3"]["embed"]["table"])[base_id]
    )
    np.testing.assert_allclose(
        emb[0, 1], np.asarray(params["extra_embed"]["table"])[0]
    )


def test_next_token_loss_ignores_minus_100():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[-100, 2, -100, 3]])
    # uniform logits -> loss = log(8) over the 2 valid shifted targets
    # shifted labels: [2, -100, 3] -> valid count 2
    loss = float(next_token_loss(logits, labels))
    np.testing.assert_allclose(loss, np.log(8), rtol=1e-6)


def test_perceiver_media_permutation_invariance():
    """No positional info over media tokens -> latent outputs invariant under
    permutation of encoder patches (structural property of the resampler)."""
    from aki_tpu.models.perceiver import init_perceiver, perceiver_forward

    rng = np.random.RandomState(3)
    p = init_perceiver(jax.random.PRNGKey(4), CFG.perceiver)
    feats = rng.randn(1, 9, CFG.perceiver.dim).astype(np.float32)
    out1 = np.asarray(perceiver_forward(p, CFG.perceiver, jnp.array(feats), policy=F32))
    perm = rng.permutation(9)
    out2 = np.asarray(
        perceiver_forward(p, CFG.perceiver, jnp.array(feats[:, perm]), policy=F32)
    )
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-5)
