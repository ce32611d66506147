"""Fused int8-KV decode attention: kernel vs dense oracle + engine path."""

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import decode_step, generate, prefill
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import F32
from aki_tpu.models.configs import aki_tiny
from aki_tpu.ops.decode_attention import (
    build_qblock, decode_attention_flat, decode_attention_flat_xla,
    quantize_kv_flat,
)

CFG = aki_tiny()


def _oracle(q, kf, ks, vf, vs, kv_valid, d):
    """Dense softmax over the dequantized flat cache (numpy, fp64).

    q is fp — the Pallas kernel quantizes q and the probability rows to
    int8, so comparisons use a tolerance. Scales are token-major
    (B, S, Hkv), matching the cache contract.
    """
    b, _, h, _ = q.shape
    hkv = ks.shape[2]
    g = h // hkv
    s_len = kf.shape[1]
    k = kf.reshape(b, s_len, hkv, d).astype(np.float64)
    v = vf.reshape(b, s_len, hkv, d).astype(np.float64)
    k = k * ks[..., None]                      # (B, S, Hkv, d)
    v = v * vs[..., None]
    out = np.zeros((b, 1, h, d))
    for bi in range(b):
        for hi in range(h):
            kk, vv = k[bi, :, hi // g], v[bi, :, hi // g]
            s = (q[bi, 0, hi].astype(np.float64) @ kk.T) * (d ** -0.5)
            s = np.where(kv_valid[bi] != 0, s, -1e30)
            p = np.exp(s - s.max())
            p = np.where(kv_valid[bi] != 0, p, 0.0)
            out[bi, 0, hi] = (p / p.sum()) @ vv
    return out


def _flat_cache(rng, b, s, hkv, d):
    k = rng.randn(b, s, hkv, d).astype(np.float32)
    v = rng.randn(b, s, hkv, d).astype(np.float32)
    kf, ks = quantize_kv_flat(jnp.asarray(k))   # (B, S, Hkv*DP), (B, S, Hkv)
    vf, vs = quantize_kv_flat(jnp.asarray(v))
    return kf, ks, vf, vs


def test_kernel_matches_dense_oracle():
    rng = np.random.RandomState(0)
    b, h, hkv, s, d = 2, 4, 2, 40, 16
    q = rng.randn(b, 1, h, d).astype(np.float32)
    kf, ks, vf, vs = _flat_cache(rng, b, s, hkv, d)
    lengths = np.array([25, 37], np.int32)
    kv_valid = (np.arange(s)[None] < lengths[:, None]).astype(np.int32)

    got = decode_attention_flat(
        jnp.asarray(q), kf[None], ks[None], vf[None], vs[None],
        jnp.asarray(lengths), jnp.zeros((), jnp.int32), interpret=True,
    )
    want = _oracle(q, np.asarray(kf), np.asarray(ks), np.asarray(vf),
                   np.asarray(vs), kv_valid, d)
    # q and the probability rows are int8-quantized in the kernel
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.03, atol=0.03)


def test_kernel_layer_select_and_block_skip():
    """The scalar-prefetched layer index picks the right cache layer, and
    slots past `lengths` contribute nothing even when poisoned."""
    rng = np.random.RandomState(1)
    b, h, hkv, s, d, L = 1, 2, 2, 256, 16, 3
    q = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    layers = [_flat_cache(rng, b, s, hkv, d) for _ in range(L)]
    kf = jnp.stack([x[0] for x in layers])
    ks = jnp.stack([x[1] for x in layers])
    vf = jnp.stack([x[2] for x in layers])
    vs = jnp.stack([x[3] for x in layers])
    lengths = jnp.asarray([120], jnp.int32)
    valid = (np.arange(s)[None] < 120).astype(np.int32)

    for li in range(L):
        got = decode_attention_flat(
            q, kf, ks, vf, vs, lengths,
            jnp.asarray(li, jnp.int32), block_kv=128, interpret=True,
        )
        want = _oracle(q, np.asarray(kf[li]), np.asarray(ks[li]),
                       np.asarray(vf[li]), np.asarray(vs[li]), valid, d)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0.03,
                                   atol=0.03, err_msg=f"layer {li}")

    # poison the region past length: block 1 (slots 128..255) is skipped
    kf_b = kf.at[:, :, 150:, :].set(127)
    vf_b = vf.at[:, :, 150:, :].set(127)
    out_a = decode_attention_flat(q, kf, ks, vf, vs,
                                  lengths, jnp.asarray(0, jnp.int32),
                                  block_kv=128, interpret=True)
    out_b = decode_attention_flat(q, kf_b, ks, vf_b, vs,
                                  lengths, jnp.asarray(0, jnp.int32),
                                  block_kv=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))


def test_xla_variant_matches_dense_oracle():
    """The XLA-native int8 decode (production default) matches the same
    dequantized-cache oracle as the Pallas kernel, GQA included."""
    rng = np.random.RandomState(4)
    for b, h, hkv, s, d in ((2, 4, 2, 40, 16), (2, 4, 4, 40, 16)):
        q = rng.randn(b, 1, h, d).astype(np.float32)
        kf, ks, vf, vs = _flat_cache(rng, b, s, hkv, d)
        lengths = np.array([25, 37], np.int32)
        kv_valid = (np.arange(s)[None] < lengths[:, None]).astype(np.int32)

        got = decode_attention_flat_xla(
            jnp.asarray(q), kf[None], ks[None], vf[None], vs[None],
            jnp.asarray(lengths), jnp.zeros((), jnp.int32),
        )
        want = _oracle(q, np.asarray(kf), np.asarray(ks), np.asarray(vf),
                       np.asarray(vs), kv_valid, d)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0.03,
                                   atol=0.03, err_msg=f"hkv={hkv}")


def test_xla_variant_layer_select():
    rng = np.random.RandomState(5)
    b, h, hkv, s, d, L = 1, 2, 2, 64, 16, 3
    q = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    layers = [_flat_cache(rng, b, s, hkv, d) for _ in range(L)]
    kf = jnp.stack([x[0] for x in layers])
    ks = jnp.stack([x[1] for x in layers])
    vf = jnp.stack([x[2] for x in layers])
    vs = jnp.stack([x[3] for x in layers])
    lengths = jnp.asarray([50], jnp.int32)
    valid = (np.arange(s)[None] < 50).astype(np.int32)
    for li in range(L):
        got = decode_attention_flat_xla(
            q, kf, ks, vf, vs, lengths, jnp.asarray(li, jnp.int32),
        )
        want = _oracle(q, np.asarray(kf[li]), np.asarray(ks[li]),
                       np.asarray(vf[li]), np.asarray(vs[li]), valid, d)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0.03,
                                   atol=0.03, err_msg=f"layer {li}")


def test_build_qblock_is_block_diagonal():
    rng = np.random.RandomState(2)
    b, h, hkv, d = 2, 4, 2, 16
    q = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    qb, qs = build_qblock(q, hkv)
    assert qb.shape == (b, h, hkv * d) and qb.dtype == jnp.int8
    qb = np.asarray(qb)
    for hi in range(h):
        blk = hi // (h // hkv)
        row = qb[0, hi].reshape(hkv, d)
        assert (row[np.arange(hkv) != blk] == 0).all()
        deq = row[blk].astype(np.float32) * float(qs[0, hi])
        np.testing.assert_allclose(deq, np.asarray(q)[0, 0, hi], atol=0.02)


def _batch(rng, b=2, t=14):
    ids = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = CFG.media_token_id
    ids[:, 8] = CFG.assistant_token_id
    valid = np.ones((b, t), np.int32)
    s = CFG.siglip.image_size
    imgs = rng.randn(b, s, s, 3).astype(np.float32)
    return jnp.array(ids), jnp.array(imgs), jnp.array(valid)


def test_engine_kv_int8_close_to_bf16_path():
    """Teacher-forced decode with the int8 cache tracks the fp32 engine
    within quantization error."""
    rng = np.random.RandomState(2)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    ids, imgs, valid = _batch(rng)

    s_fp = prefill(params, CFG, ids, imgs, valid, max_len=48, policy=F32,
                   use_flash=False)
    s_q8 = prefill(params, CFG, ids, imgs, valid, max_len=48, policy=F32,
                   use_flash=False, kv_int8=True)
    np.testing.assert_allclose(
        np.asarray(s_q8.last_logits), np.asarray(s_fp.last_logits),
        rtol=2e-2, atol=2e-2,
    )
    forced = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(4, 2))
    for step in range(4):
        tok = jnp.asarray(forced[step], jnp.int32)
        s_fp = decode_step(params, CFG, s_fp, tok, policy=F32)
        s_q8 = decode_step(params, CFG, s_q8, tok, policy=F32)
        lf = np.asarray(s_fp.last_logits)
        lq = np.asarray(s_q8.last_logits)
        rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
        assert rel < 0.05, (step, rel)


def test_decode_live_width_matches_full_on_prefix():
    """Tail-compaction contract: decode_step(live_width=w) on the q8 XLA
    path must produce bit-identical logits for the first w rows (the cache
    read is a fused batch-prefix slice — same math, fewer bytes); rows
    past the prefix are dead (engine freezes their bookkeeping)."""
    import functools

    rng = np.random.RandomState(11)
    params = init_aki(jax.random.PRNGKey(2), CFG)
    ids, imgs, valid = _batch(rng)          # batch 2
    # stack to batch 4 so live_width=2 is a real prefix
    ids = jnp.concatenate([ids, ids[::-1]], axis=0)
    imgs = jnp.concatenate([imgs, imgs[::-1]], axis=0)
    valid = jnp.concatenate([valid, valid[::-1]], axis=0)

    state = prefill(params, CFG, ids, imgs, valid, max_len=64, policy=F32,
                    use_flash=False, kv_int8=True)
    step_full = jax.jit(functools.partial(decode_step, policy=F32),
                        static_argnums=(1,))
    step_live = jax.jit(
        functools.partial(decode_step, policy=F32, live_width=2),
        static_argnums=(1,),
    )
    tok = jnp.asarray(rng.randint(5, CFG.initial_tokenizer_len - 1,
                                  size=(4,)), jnp.int32)
    s_full = state
    s_live = state
    for _ in range(3):
        s_full = step_full(params, CFG, s_full, tok)
        s_live = step_live(params, CFG, s_live, tok)
        np.testing.assert_array_equal(
            np.asarray(s_live.last_logits)[:2],
            np.asarray(s_full.last_logits)[:2],
        )


def test_kv_int8_no_drift_over_long_decode():
    """Accumulated-error check (ADVICE r2): 32 teacher-forced steps through
    the int8 cache must not drift — every step's logits stay within the
    single-step quantization band vs the fp32 engine, and the late-step
    error is no worse than the early-step error (each decode re-reads the
    cache fresh; errors must not compound through the KV writes)."""
    import functools

    rng = np.random.RandomState(7)
    params = init_aki(jax.random.PRNGKey(0), CFG)
    ids, imgs, valid = _batch(rng)
    n_steps = 32

    s_fp = prefill(params, CFG, ids, imgs, valid, max_len=64, policy=F32,
                   use_flash=False)
    s_q8 = prefill(params, CFG, ids, imgs, valid, max_len=64, policy=F32,
                   use_flash=False, kv_int8=True)
    step_fp = jax.jit(functools.partial(decode_step, policy=F32),
                      static_argnums=(1,))
    forced = rng.randint(5, CFG.initial_tokenizer_len - 1, size=(n_steps, 2))
    rels = []
    for step in range(n_steps):
        tok = jnp.asarray(forced[step], jnp.int32)
        s_fp = step_fp(params, CFG, s_fp, tok)
        s_q8 = step_fp(params, CFG, s_q8, tok)
        lf = np.asarray(s_fp.last_logits)
        lq = np.asarray(s_q8.last_logits)
        rels.append(np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9))
    rels = np.asarray(rels)
    assert rels.max() < 0.06, rels
    # no compounding: the last-quarter error band tracks the first-quarter
    # band (ratio bound is loose — int8 noise varies per step — but a
    # genuinely accumulating error grows far past it over 24 steps)
    early, late = rels[:8].mean(), rels[-8:].mean()
    assert late < 3.0 * max(early, 5e-3), (early, late)


def test_generate_kv_int8_runs_and_matches_shapes():
    rng = np.random.RandomState(3)
    params = init_aki(jax.random.PRNGKey(1), CFG)
    A = _batch(rng, b=1)
    toks, num = generate(params, CFG, *A, max_new_tokens=5, max_len=48,
                         policy=F32, use_flash=False, kv_int8=True)
    assert np.asarray(toks).shape == (1, 5)
    assert int(num[0]) <= 5
