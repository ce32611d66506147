"""Int8 quantization (w8 weight-only + w8a8 dynamic): numerics + generation."""

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import generate
from aki_tpu.models.aki import aki_forward, init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.models.quant import (
    mm, quantize_acts, quantize_params, quantize_tensor,
)

CFG = aki_tiny()


def test_quantize_tensor_roundtrip_error():
    rng = np.random.RandomState(0)
    w = jnp.array(rng.randn(64, 128).astype(np.float32))
    q = quantize_tensor(w)
    assert q.q.dtype == jnp.int8
    deq = np.asarray(q.q, np.float32) * np.asarray(q.s, np.float32)
    err = np.abs(deq - np.asarray(w)) / (np.abs(np.asarray(w)).max(0) + 1e-9)
    assert err.max() < 0.01  # <1% of per-channel max


def test_quantized_mm_close_to_dense():
    rng = np.random.RandomState(1)
    x = jnp.array(rng.randn(8, 64).astype(np.float32))
    w = jnp.array(rng.randn(64, 96).astype(np.float32))
    want = np.asarray(x @ w)
    got = np.asarray(mm(x, quantize_tensor(w)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02
    # w8a8: per-row act quant + int8xint8 dot; looser but bounded
    got8 = np.asarray(mm(x, quantize_tensor(w, a8=True)), np.float32)
    rel8 = np.abs(got8 - want).max() / np.abs(want).max()
    assert rel8 < 0.04, rel8


def test_quantize_acts_rowwise():
    rng = np.random.RandomState(3)
    x = jnp.array(rng.randn(4, 32).astype(np.float32) * [[1], [10], [100], [0.01]])
    q, s = quantize_acts(x)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(deq - np.asarray(x)).max(axis=1)
    row_max = np.abs(np.asarray(x)).max(axis=1)
    assert (err / row_max < 0.01).all()


def test_w8a8_under_jit_static_flag():
    """The a8 flag is static pytree metadata — jit must not trace it."""
    rng = np.random.RandomState(4)
    x = jnp.array(rng.randn(8, 64).astype(np.float32))
    w = quantize_tensor(jnp.array(rng.randn(64, 96).astype(np.float32)),
                        a8=True)
    got = jax.jit(mm)(x, w)
    ref = mm(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def _batch(rng, b=1, t=14):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return jnp.array(ids), jnp.array(imgs), jnp.array(valid)


def test_fused_matches_split_quantization():
    """fuse=True concatenates kernels+scales; numerics must be identical
    to the split form (per-output-channel scales are independent)."""
    rng = np.random.RandomState(7)
    params = init_aki(jax.random.PRNGKey(3), CFG)
    A = _batch(rng)
    split = aki_forward(quantize_params(params, fuse=False, vision=False),
                        CFG, *A, policy=F32, use_flash=False)
    fused = aki_forward(quantize_params(params, fuse=True, vision=False),
                        CFG, *A, policy=F32, use_flash=False)
    np.testing.assert_allclose(np.asarray(fused.logits),
                               np.asarray(split.logits), rtol=1e-5, atol=1e-5)


def test_quantized_forward_close_and_generation_runs():
    rng = np.random.RandomState(2)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params)
    assert qparams["phi3"]["layers"]["wq"].q.dtype == jnp.int8
    assert qparams["siglip"]["layers"]["wo"].q.dtype == jnp.int8
    fused = quantize_params(params, fuse=True)
    assert fused["phi3"]["layers"]["wqkv"].q.dtype == jnp.int8
    assert fused["siglip"]["layers"]["wqkv"].q.dtype == jnp.int8

    A = _batch(rng)
    fp = aki_forward(params, CFG, *A, policy=F32, use_flash=False)
    q = aki_forward(qparams, CFG, *A, policy=F32, use_flash=False)
    lf = np.asarray(fp.logits, np.float32)
    lq = np.asarray(q.logits, np.float32)
    rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
    assert rel < 0.1, rel  # random init is noise-sensitive; loose bound

    toks, _ = generate(qparams, CFG, *A, max_new_tokens=4, max_len=48,
                       policy=F32, use_flash=False)
    assert np.asarray(toks).shape == (1, 4)


def test_w8a8_forward_close_and_generation_runs():
    rng = np.random.RandomState(5)
    params = init_aki(jax.random.PRNGKey(1), CFG)
    qparams = quantize_params(params, mode="w8a8")
    assert qparams["phi3"]["layers"]["wq"].a8

    A = _batch(rng)
    fp = aki_forward(params, CFG, *A, policy=F32, use_flash=False)
    q = aki_forward(qparams, CFG, *A, policy=F32, use_flash=False)
    lf = np.asarray(fp.logits, np.float32)
    lq = np.asarray(q.logits, np.float32)
    rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
    assert rel < 0.15, rel

    toks, _ = generate(qparams, CFG, *A, max_new_tokens=4, max_len=48,
                       policy=F32, use_flash=False)
    assert np.asarray(toks).shape == (1, 4)


def test_w4_quantization_and_forward_runs():
    """int4 per-channel weights: coarse but bounded error; model runs."""
    rng = np.random.RandomState(9)
    w = jnp.array(rng.randn(64, 96).astype(np.float32))
    q4 = quantize_tensor(w, bits=4)
    assert str(q4.q.dtype) == "int4"
    deq = np.asarray(q4.q, np.float32) * np.asarray(q4.s, np.float32)
    err = np.abs(deq - np.asarray(w)) / (np.abs(np.asarray(w)).max(0) + 1e-9)
    assert err.max() < 0.08  # < 1/(2*7) of per-channel max

    params = init_aki(jax.random.PRNGKey(2), CFG)
    q = quantize_params(params, mode="w4a8")
    assert str(q["phi3"]["layers"]["wq"].q.dtype) == "int4"
    assert q["siglip"]["layers"]["wo"].q.dtype == jnp.int8  # vision stays 8b
    A = _batch(np.random.RandomState(10), b=1)
    out = aki_forward(q, CFG, *A, policy=F32, use_flash=False)
    assert np.isfinite(np.asarray(out.logits, np.float32)).all()
