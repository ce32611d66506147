"""Flash MMA kernel numerics vs the dense oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aki_tpu.ops.attention import dense_attention
from aki_tpu.ops.flash_mma import flash_mma_attention
from aki_tpu.ops.masks import MMASpec, causal_spec


def rand_qkv(rng, b, t, s, h, d, hkv=None):
    hkv = hkv or h
    q = jnp.array(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.array(rng.randn(b, s, hkv, d), jnp.float32)
    v = jnp.array(rng.randn(b, s, hkv, d), jnp.float32)
    return q, k, v


def spec_for(b, rows):
    a = np.array(rows, np.int32).reshape(b, -1, 3)
    return MMASpec(
        img_start=jnp.array(a[:, :, 0]),
        txt_start=jnp.array(a[:, :, 1]),
        txt_end=jnp.array(a[:, :, 2]),
    )


@pytest.mark.parametrize("t", [64, 130, 300])
def test_flash_matches_dense_mma(t):
    rng = np.random.RandomState(0)
    b, h, d = 2, 2, 64
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    spec = spec_for(b, [[5, 25, 40], [0, 30, 60]])
    kv_valid = jnp.array(
        np.concatenate([np.ones((b, t - 7)), np.zeros((b, 7))], 1), jnp.int32
    )
    got = flash_mma_attention(
        q, k, v, spec=spec, kv_valid=kv_valid, interpret=True,
        block_q=128, block_kv=128,
    )
    want = dense_attention(q, k, v, spec=spec, kv_valid=kv_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_fully_masked_rows_are_zero():
    """Rows with NO valid key (left-padded samples: kv_valid zero over the
    whole causal frontier) must output exactly 0, matching the dense
    oracle — regression for the single-KV-tile kernel variant, which
    dropped the dead-row zeroing when it dropped the per-head mask pass."""
    rng = np.random.RandomState(7)
    b, t, h, d = 2, 64, 2, 32
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    # left padding: the first 4 keys of sample 0 are invalid, so causal
    # rows 0..3 of sample 0 have no support at all
    kv_valid = np.ones((b, t), np.int32)
    kv_valid[0, :4] = 0
    kv_valid = jnp.asarray(kv_valid)

    got = flash_mma_attention(q, k, v, kv_valid=kv_valid, interpret=True)
    want = dense_attention(q, k, v, spec=causal_spec(b), kv_valid=kv_valid)
    np.testing.assert_allclose(np.asarray(got)[0, :4], 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_flash_causal_only():
    rng = np.random.RandomState(1)
    q, k, v = rand_qkv(rng, 1, 200, 200, 4, 32)
    got = flash_mma_attention(q, k, v, interpret=True, block_q=128, block_kv=128)
    want = dense_attention(q, k, v, spec=causal_spec(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_gqa():
    rng = np.random.RandomState(2)
    q, k, v = rand_qkv(rng, 1, 150, 150, 8, 32, hkv=2)
    spec = spec_for(1, [[10, 50, 90]])
    got = flash_mma_attention(q, k, v, spec=spec, interpret=True,
                              block_q=128, block_kv=128)
    want = dense_attention(q, k, v, spec=spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_multi_image_union():
    rng = np.random.RandomState(3)
    q, k, v = rand_qkv(rng, 1, 160, 160, 2, 32)
    spec = spec_for(1, [[5, 20, 35], [80, 100, 140]])
    got = flash_mma_attention(q, k, v, spec=spec, interpret=True,
                              block_q=128, block_kv=128)
    want = dense_attention(q, k, v, spec=spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_head_dim_96():
    """Phi-3's head_dim=96 exercises the lane-padding path."""
    rng = np.random.RandomState(4)
    q, k, v = rand_qkv(rng, 1, 140, 140, 2, 96)
    spec = spec_for(1, [[3, 20, 50]])
    got = flash_mma_attention(q, k, v, spec=spec, interpret=True,
                              block_q=128, block_kv=128)
    want = dense_attention(q, k, v, spec=spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_grad_matches_dense():
    rng = np.random.RandomState(5)
    b, t, h, d = 1, 96, 2, 32
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    spec = spec_for(b, [[4, 16, 30]])
    kv_valid = jnp.ones((b, t), jnp.int32)

    def loss_flash(q, k, v):
        o = flash_mma_attention(q, k, v, spec=spec, kv_valid=kv_valid,
                                interpret=True, block_q=128, block_kv=128)
        return jnp.sum(o * o)

    def loss_dense(q, k, v):
        o = dense_attention(q, k, v, spec=spec, kv_valid=kv_valid)
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_decode_single_row_fallback():
    rng = np.random.RandomState(6)
    b, s, h, d = 2, 64, 2, 32
    q, k, v = rand_qkv(rng, b, 1, s, h, d)
    kv_valid = jnp.array(np.concatenate([np.ones((b, 40)), np.zeros((b, 24))], 1),
                         jnp.int32)
    got = flash_mma_attention(q, k, v, kv_valid=kv_valid,
                              q_offset=jnp.array([39, 20]), interpret=True)
    want = dense_attention(q, k, v, spec=causal_spec(b), kv_valid=kv_valid,
                           q_offset=jnp.array([39, 20]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_noncausal_matches_dense():
    rng = np.random.RandomState(7)
    b, t, h, d = 2, 150, 2, 64
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    got = flash_mma_attention(q, k, v, causal=False, interpret=True,
                              block_q=128, block_kv=128)
    want = dense_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_noncausal_grad():
    rng = np.random.RandomState(8)
    q, k, v = rand_qkv(rng, 1, 96, 96, 2, 32)

    def lf(q, k, v):
        o = flash_mma_attention(q, k, v, causal=False, interpret=True,
                                block_q=128, block_kv=128)
        return jnp.sum(o * o)

    def ld(q, k, v):
        o = dense_attention(q, k, v, causal=False)
        return jnp.sum(o * o)

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(ld, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_flash_bwd_matches_dense_bwd_matrix():
    """Flash backward vs rematerialized-dense backward across GQA/padding/
    multi-image cases."""
    import aki_tpu.ops.flash_mma as fm

    cases = [
        dict(b=2, t=130, h=2, hkv=2, d=64, spec=[[5, 25, 40], [0, 30, 60]],
             pad=7),
        dict(b=1, t=150, h=8, hkv=2, d=32, spec=[[10, 50, 90]], pad=0),
        dict(b=1, t=160, h=2, hkv=2, d=96, spec=[[5, 20, 35], [80, 100, 140]],
             pad=11),
    ]
    for i, c in enumerate(cases):
        rng = np.random.RandomState(20 + i)
        q, k, v = rand_qkv(rng, c["b"], c["t"], c["t"], c["h"], c["d"],
                           hkv=c["hkv"])
        spec = spec_for(c["b"], [c["spec"][j % len(c["spec"])]
                                 for j in range(c["b"])])
        kv_valid = jnp.array(
            np.concatenate([np.ones((c["b"], c["t"] - c["pad"])),
                            np.zeros((c["b"], c["pad"]))], 1), jnp.int32)

        def loss(q, k, v):
            o = flash_mma_attention(q, k, v, spec=spec, kv_valid=kv_valid,
                                    interpret=True, block_q=128, block_kv=128)
            return jnp.sum(jnp.sin(o))

        old = fm.BACKWARD_IMPL
        try:
            fm.BACKWARD_IMPL = "flash"
            gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            fm.BACKWARD_IMPL = "dense"
            gd = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fm.BACKWARD_IMPL = old
        for a, b_ in zip(gf, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4,
                err_msg=f"case {i}",
            )


def test_flash_plain_path_matches_dense():
    """Full attention with no kv_valid hits the maskless fast path where
    key-pad masking rides the q/k bias lane (SigLIP shapes: T=729 pads to
    768, D=72 pads to 128 leaving a free lane)."""
    rng = np.random.RandomState(9)
    b, t, h, d = 2, 181, 4, 72   # t % 128 != 0 -> padded keys exist
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    got = flash_mma_attention(q, k, v, causal=False, interpret=True)
    want = dense_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # d == d_pad leaves no free lane: must fall back to the masked kernel
    q2, k2, v2 = rand_qkv(rng, b, t, t, h, 128)
    got2 = flash_mma_attention(q2, k2, v2, causal=False, interpret=True)
    want2 = dense_attention(q2, k2, v2, causal=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-4, atol=2e-4)


def test_flash_plain_grad_matches_dense():
    rng = np.random.RandomState(10)
    q, k, v = rand_qkv(rng, 1, 90, 90, 2, 24)

    def lf(q, k, v):
        o = flash_mma_attention(q, k, v, causal=False, interpret=True)
        return jnp.sum(o * o)

    def ld(q, k, v):
        o = dense_attention(q, k, v, causal=False)
        return jnp.sum(o * o)

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(ld, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def _flatten_padded(x, half_aligned, pad_to=128):
    """(B,T,H,D) -> flat (B,T,H*pad_to) with the serving head-pad layout."""
    b, t, h, d = x.shape
    out = np.zeros((b, t, h, pad_to), np.float32)
    if half_aligned:   # q/k: rope halves pad independently
        out[..., : d // 2] = np.asarray(x[..., : d // 2])
        out[..., pad_to // 2: pad_to // 2 + d // 2] = np.asarray(x[..., d // 2:])
    else:              # v: tail pad
        out[..., :d] = np.asarray(x)
    return jnp.asarray(out.reshape(b, t, h * pad_to))


def test_flash_flat_matches_dense():
    """The flat padded-head serving kernel matches the dense oracle (and
    the output sits in the tail-pad layout wo expects)."""
    from aki_tpu.ops.flash_mma import flash_mma_attention_flat

    rng = np.random.RandomState(11)
    b, t, h, d = 2, 180, 4, 64
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    spec = MMASpec(
        img_start=jnp.zeros((b, 1), jnp.int32),
        txt_start=jnp.full((b, 1), 40, jnp.int32),
        txt_end=jnp.full((b, 1), t, jnp.int32),
    )
    kvv = np.ones((b, t), np.int32)
    kvv[1, 150:] = 0
    kvv = jnp.asarray(kvv)

    qf = _flatten_padded(q, True)
    kf = _flatten_padded(k, True)
    vf = _flatten_padded(v, False)
    got = flash_mma_attention_flat(
        qf, kf, vf, num_heads=h, head_dim=d, spec=spec, kv_valid=kvv,
        interpret=True,
    )
    got = np.asarray(got).reshape(b, t, h, 128)
    want = np.asarray(dense_attention(q, k, v, spec=spec, kv_valid=kvv))
    np.testing.assert_allclose(got[..., :d], want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[..., d:], 0.0, atol=1e-7)


def test_flash_q8_matches_dense():
    """The int8-operand forward (flash_mma_attention_q8) matches the dense
    oracle to int8 quantization tolerance, incl. MMA spec + kv_valid."""
    from aki_tpu.ops.flash_mma import flash_mma_attention_q8

    rng = np.random.RandomState(12)
    b, t, h, d = 2, 180, 4, 64
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    spec = MMASpec(
        img_start=jnp.zeros((b, 1), jnp.int32),
        txt_start=jnp.full((b, 1), 40, jnp.int32),
        txt_end=jnp.full((b, 1), t, jnp.int32),
    )
    kvv = np.ones((b, t), np.int32)
    kvv[1, 150:] = 0
    kvv = jnp.asarray(kvv)

    got = np.asarray(flash_mma_attention_q8(
        q, k, v, spec=spec, kv_valid=kvv, interpret=True))
    want = np.asarray(dense_attention(q, k, v, spec=spec, kv_valid=kvv))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale


def test_flash_q8_noncausal_plain():
    from aki_tpu.ops.flash_mma import flash_mma_attention_q8

    rng = np.random.RandomState(13)
    b, t, h, d = 2, 100, 2, 32
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    got = np.asarray(flash_mma_attention_q8(q, k, v, causal=False,
                                            interpret=True))
    want = np.asarray(dense_attention(q, k, v, causal=False))
    assert np.abs(got - want).max() < 0.05 * np.abs(want).max()


def test_encoder_attention_xla_matches_dense():
    """The vision-tower XLA fast path (bf16 probabilities) matches the
    f32 dense oracle to bf16-probability tolerance."""
    from aki_tpu.ops.attention import encoder_attention_xla

    rng = np.random.RandomState(14)
    b, t, h, d = 2, 100, 4, 24
    q, k, v = rand_qkv(rng, b, t, t, h, d)
    got = np.asarray(encoder_attention_xla(q, k, v).astype(jnp.float32))
    want = np.asarray(dense_attention(q, k, v, causal=False))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
