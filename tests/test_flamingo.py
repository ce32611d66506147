"""Flamingo gated cross-attention variant tests."""

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.models.flamingo import (
    flamingo_decoder_forward, gated_xattn_block, init_gated_xattn,
)
from aki_tpu.models.phi3 import init_phi3, phi3_forward

CFG = aki_tiny()


def make_params(key=0, every_n=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    phi3 = init_phi3(k1, CFG.phi3)
    G = CFG.phi3.num_layers // every_n
    xattn = init_gated_xattn(
        k2, CFG.phi3.hidden_size, CFG.phi3.hidden_size, G,
        dim_head=8, heads=2, ff_mult=2,
    )
    return {"phi3": phi3, "xattn": xattn}


def make_inputs(rng, b=2, t=10, t_img=2, n_lat=3):
    embeds = jnp.array(rng.randn(b, t, CFG.phi3.hidden_size), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    media = jnp.array(
        rng.randn(b, t_img, n_lat, CFG.phi3.hidden_size), jnp.float32
    )
    locs = np.zeros((b, t), bool)
    locs[:, 1] = True
    locs[:, 5] = True
    return embeds, positions, media, jnp.array(locs)


def fwd(params, embeds, positions, media, locs, **kw):
    return flamingo_decoder_forward(
        params, CFG, embeds, positions, media, locs,
        policy=F32, use_flash=False, xattn_heads=2, xattn_dim_head=8, **kw,
    )


def test_zero_gates_equal_base_lm():
    """tanh(0)=0 gates: output must equal the plain Phi-3 stack at init."""
    rng = np.random.RandomState(0)
    params = make_params(every_n=1)
    embeds, positions, media, locs = make_inputs(rng)
    out = np.asarray(fwd(params, embeds, positions, media, locs,
                         cross_attn_every_n=1))
    base, _ = phi3_forward(
        params["phi3"], CFG.phi3, embeds, positions, policy=F32,
        use_flash=False,
    )
    np.testing.assert_allclose(out, np.asarray(base), rtol=1e-5, atol=1e-5)


def test_open_gates_use_media():
    rng = np.random.RandomState(1)
    params = make_params(every_n=1)
    params["xattn"]["attn_gate"] = jnp.ones_like(params["xattn"]["attn_gate"])
    embeds, positions, media, locs = make_inputs(rng)
    out1 = np.asarray(fwd(params, embeds, positions, media, locs,
                          cross_attn_every_n=1))
    media2 = media + 1.0
    out2 = np.asarray(fwd(params, embeds, positions, media2, locs,
                          cross_attn_every_n=1))
    assert np.abs(out1 - out2).max() > 1e-5


def test_immediate_media_masking():
    """Text attends only the most recent preceding image; text before any
    image gets zero cross-attention."""
    rng = np.random.RandomState(2)
    b, t, t_img, n_lat = 1, 8, 2, 2
    d = CFG.phi3.hidden_size
    xp = jax.tree.map(
        lambda a: a[0],
        init_gated_xattn(jax.random.PRNGKey(3), d, d, 1, dim_head=8, heads=2),
    )
    xp["attn_gate"] = jnp.ones((1,))
    x = jnp.array(rng.randn(b, t, d), jnp.float32)
    media = jnp.array(rng.randn(b, t_img, n_lat, d), jnp.float32)
    locs = np.zeros((b, t), bool)
    locs[:, 2] = True   # image 1 at position 2
    locs[:, 5] = True   # image 2 at position 5
    locs = jnp.array(locs)

    out = np.asarray(gated_xattn_block(xp, x, media, locs, heads=2, dim_head=8))
    # perturb image 1: positions 2..4 change, positions >= 5 do NOT
    media_p = media.at[:, 0].add(3.0)
    out_p = np.asarray(gated_xattn_block(xp, x, media_p, locs, heads=2, dim_head=8))
    assert np.abs(out[0, 2:5] - out_p[0, 2:5]).max() > 1e-5
    np.testing.assert_allclose(out[0, 5:], out_p[0, 5:], atol=1e-6)
    # positions before any image: identical to pure FF path (attn zeroed)
    np.testing.assert_allclose(out[0, :2], out_p[0, :2], atol=1e-6)


def test_attend_all_previous_media():
    rng = np.random.RandomState(4)
    b, t, t_img, n_lat = 1, 8, 2, 2
    d = CFG.phi3.hidden_size
    xp = jax.tree.map(
        lambda a: a[0],
        init_gated_xattn(jax.random.PRNGKey(5), d, d, 1, dim_head=8, heads=2),
    )
    xp["attn_gate"] = jnp.ones((1,))
    x = jnp.array(rng.randn(b, t, d), jnp.float32)
    media = jnp.array(rng.randn(b, t_img, n_lat, d), jnp.float32)
    locs = jnp.array([[0, 0, 1, 0, 0, 1, 0, 0]], bool)
    out = np.asarray(gated_xattn_block(
        xp, x, media, locs, heads=2, dim_head=8,
        only_attend_immediate_media=False,
    ))
    media_p = media.at[:, 0].add(3.0)
    out_p = np.asarray(gated_xattn_block(
        xp, x, media_p, locs, heads=2, dim_head=8,
        only_attend_immediate_media=False,
    ))
    # with >= masking, image 1 influences positions 5.. too
    assert np.abs(out[0, 5:] - out_p[0, 5:]).max() > 1e-5
