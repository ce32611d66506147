"""Golden tests for the MMA mask against an independent numpy oracle.

The oracle re-derives the reference contract (vlm.py:410-443) directly from
its definition: causal 0/1 matrix, open the block
``[img_start:txt_start, txt_start:txt_end]``, zero padded key columns.
"""

import numpy as np
import jax.numpy as jnp

from aki_tpu.ops.masks import MMASpec, allowed_mask, causal_spec, dense_bias
from aki_tpu.ops.attention import dense_attention


def oracle_mask(t, img_start, txt_start, txt_end, kv_valid=None):
    m = np.tril(np.ones((t, t), dtype=bool))
    m[img_start:txt_start, txt_start:txt_end] = True
    if kv_valid is not None:
        m &= np.asarray(kv_valid, dtype=bool)[None, :]
    return m


def spec1(img_start, txt_start, txt_end):
    return MMASpec(
        img_start=jnp.array([img_start], jnp.int32),
        txt_start=jnp.array([txt_start], jnp.int32),
        txt_end=jnp.array([txt_end], jnp.int32),
    )


def test_mma_block_basic():
    # image spliced at 2, 4 vision tokens, assistant at text pos 5 -> spliced 9
    t = 16
    spec = spec1(2, 6, 9)
    got = np.asarray(allowed_mask(spec, t, t))[0]
    want = oracle_mask(t, 2, 6, 9)
    np.testing.assert_array_equal(got, want)
    # the vision rows really do see forward keys
    assert got[3, 8] and not got[3, 9] and not got[1, 8]


def test_empty_block_is_causal():
    t = 12
    got = np.asarray(allowed_mask(causal_spec(1), t, t))[0]
    np.testing.assert_array_equal(got, np.tril(np.ones((t, t), bool)))
    # pretrain degenerate case: txt_end (=n_vis) <= txt_start
    spec = spec1(1, 5, 4)
    got = np.asarray(allowed_mask(spec, t, t))[0]
    np.testing.assert_array_equal(got, np.tril(np.ones((t, t), bool)))


def test_padding_zeroes_key_columns():
    t = 10
    kv_valid = jnp.array([[1] * 7 + [0] * 3])
    spec = spec1(1, 4, 6)
    got = np.asarray(allowed_mask(spec, t, t, kv_valid=kv_valid))[0]
    want = oracle_mask(t, 1, 4, 6, kv_valid=[1] * 7 + [0] * 3)
    np.testing.assert_array_equal(got, want)
    assert not got[9, 8]


def test_multi_image_union():
    t = 20
    spec = MMASpec(
        img_start=jnp.array([[1, 10]], jnp.int32),
        txt_start=jnp.array([[4, 13]], jnp.int32),
        txt_end=jnp.array([[6, 16]], jnp.int32),
    )
    got = np.asarray(allowed_mask(spec, t, t))[0]
    want = np.tril(np.ones((t, t), bool))
    want[1:4, 4:6] = True
    want[10:13, 13:16] = True
    np.testing.assert_array_equal(got, want)


def test_decode_q_offset():
    # one query row at absolute position 7 over a 10-long KV: causal over all
    spec = causal_spec(1)
    got = np.asarray(allowed_mask(spec, 1, 10, q_offset=7))[0, 0]
    want = np.arange(10) <= 7
    np.testing.assert_array_equal(got, want)


def test_dense_bias_values():
    spec = spec1(1, 3, 5)
    bias = np.asarray(dense_bias(spec, 6, 6))
    assert bias.shape == (1, 1, 6, 6)
    assert bias[0, 0, 2, 4] == 0.0  # vision row attends question
    assert bias[0, 0, 0, 4] < -1e30


def test_dense_attention_matches_manual_softmax():
    rng = np.random.RandomState(0)
    b, t, h, d = 2, 8, 2, 4
    q = jnp.array(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.array(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.array(rng.randn(b, t, h, d), jnp.float32)
    spec = MMASpec(
        img_start=jnp.array([1, 0], jnp.int32),
        txt_start=jnp.array([4, 0], jnp.int32),
        txt_end=jnp.array([6, 3], jnp.int32),
    )
    out = np.asarray(dense_attention(q, k, v, spec=spec))

    # manual oracle
    for i in range(b):
        m = oracle_mask(
            t, int(spec.img_start[i]), int(spec.txt_start[i]), int(spec.txt_end[i])
        )
        qe = np.asarray(q[i]).transpose(1, 0, 2)  # h t d
        ke = np.asarray(k[i]).transpose(1, 0, 2)
        ve = np.asarray(v[i]).transpose(1, 0, 2)
        logits = qe @ ke.transpose(0, 2, 1) / np.sqrt(d)
        logits = np.where(m[None], logits, -1e30)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = (p @ ve).transpose(1, 0, 2)
        np.testing.assert_allclose(out[i], want, rtol=2e-5, atol=2e-5)


def test_fully_masked_query_rows_are_zero_not_nan():
    b, t, h, d = 1, 6, 1, 4
    q = jnp.ones((b, t, h, d), jnp.float32)
    k = jnp.ones((b, t, h, d), jnp.float32)
    v = jnp.ones((b, t, h, d), jnp.float32)
    kv_valid = jnp.array([[0, 0, 1, 1, 1, 1]])
    out = np.asarray(
        dense_attention(q, k, v, spec=causal_spec(1), kv_valid=kv_valid)
    )
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[0, 0], np.zeros((h, d)))
    np.testing.assert_allclose(out[0, 2], np.ones((h, d)), rtol=1e-6)
