"""Multi-image interleaved splice tests (config #5 stretch)."""

import numpy as np
import jax.numpy as jnp

from aki_tpu.models.fusion import (
    IGNORE_INDEX, splice_vision_tokens, splice_vision_tokens_multi,
)

MEDIA, ASSIST = 900, 901


def oracle_multi(ids, embeds, vis_list, labels, valid, n_vis):
    """Sequential per-image insertion oracle (numpy)."""
    e, l, v = list(embeds), list(labels), list(valid)
    positions = [i for i, t in enumerate(ids) if t == MEDIA]
    spec = []
    shift = 0
    asst = next((i for i, t in enumerate(ids) if t == ASSIST), 0)
    for j, p0 in enumerate(positions):
        p = p0 + shift
        e = e[:p] + list(vis_list[j]) + e[p + 1:]
        l = l[:p] + [IGNORE_INDEX] * n_vis + l[p + 1:]
        v = v[:p] + [1] * n_vis + v[p + 1:]
        shift += n_vis - 1
        spec.append(p)
    asst_spliced = asst + sum(1 for p0 in positions if p0 < asst) * (n_vis - 1)
    specs = [(p, p + n_vis, asst_spliced + 1) for p in spec]
    return np.array(e), np.array(l), np.array(v), specs


def test_two_images_match_oracle():
    rng = np.random.RandomState(0)
    t_txt, n_vis, d = 14, 3, 4
    ids = rng.randint(5, 100, size=(1, t_txt))
    ids[0, 1] = MEDIA
    ids[0, 6] = MEDIA
    ids[0, 10] = ASSIST
    valid = np.ones((1, t_txt), int)
    labels = rng.randint(5, 100, size=(1, t_txt))
    embeds = rng.randn(1, t_txt, d).astype(np.float32)
    vis = rng.randn(1, 2, n_vis, d).astype(np.float32)

    out = splice_vision_tokens_multi(
        jnp.array(embeds), jnp.array(vis), jnp.array(ids), jnp.array(valid),
        MEDIA, ASSIST, labels=jnp.array(labels),
    )
    oe, ol, ov, specs = oracle_multi(
        ids[0], embeds[0], vis[0], labels[0], valid[0], n_vis
    )
    np.testing.assert_allclose(np.asarray(out.embeds[0]), oe)
    np.testing.assert_array_equal(np.asarray(out.labels[0]), ol)
    np.testing.assert_array_equal(np.asarray(out.attn_valid[0]), ov)
    got_specs = [
        (int(out.spec.img_start[0, j]), int(out.spec.txt_start[0, j]),
         int(out.spec.txt_end[0, j]))
        for j in range(2)
    ]
    assert got_specs == specs


def test_single_image_reduces_to_base_splice():
    rng = np.random.RandomState(1)
    t_txt, n_vis, d = 12, 4, 6
    ids = rng.randint(5, 100, size=(2, t_txt))
    ids[:, 2] = MEDIA
    ids[:, 7] = ASSIST
    valid = np.ones((2, t_txt), int)
    labels = rng.randint(5, 100, size=(2, t_txt))
    embeds = rng.randn(2, t_txt, d).astype(np.float32)
    vis = rng.randn(2, n_vis, d).astype(np.float32)

    single = splice_vision_tokens(
        jnp.array(embeds), jnp.array(vis), jnp.array(ids), jnp.array(valid),
        MEDIA, ASSIST, labels=jnp.array(labels),
    )
    multi = splice_vision_tokens_multi(
        jnp.array(embeds), jnp.array(vis[:, None]), jnp.array(ids),
        jnp.array(valid), MEDIA, ASSIST, labels=jnp.array(labels),
    )
    np.testing.assert_allclose(np.asarray(multi.embeds), np.asarray(single.embeds))
    np.testing.assert_array_equal(np.asarray(multi.labels), np.asarray(single.labels))
    np.testing.assert_array_equal(
        np.asarray(multi.attn_valid), np.asarray(single.attn_valid)
    )
    np.testing.assert_array_equal(
        np.asarray(multi.text_pos), np.asarray(single.text_pos)
    )
    for j in range(2):
        assert int(multi.spec.img_start[j, 0]) == int(single.spec.img_start[j])
        assert int(multi.spec.txt_start[j, 0]) == int(single.spec.txt_start[j])
        assert int(multi.spec.txt_end[j, 0]) == int(single.spec.txt_end[j])


def test_missing_second_image_parked_invalid():
    rng = np.random.RandomState(2)
    t_txt, n_vis, d = 10, 3, 4
    ids = rng.randint(5, 100, size=(1, t_txt))
    ids[0, 1] = MEDIA           # only ONE image in text, N_img=2 provided
    ids[0, 6] = ASSIST
    valid = np.ones((1, t_txt), int)
    embeds = rng.randn(1, t_txt, d).astype(np.float32)
    vis = rng.randn(1, 2, n_vis, d).astype(np.float32)

    out = splice_vision_tokens_multi(
        jnp.array(embeds), jnp.array(vis), jnp.array(ids), jnp.array(valid),
        MEDIA, ASSIST,
    )
    v = np.asarray(out.attn_valid[0])
    # first image block valid; parked second block invalid
    assert v[1:1 + n_vis].all()
    assert (v[-(n_vis - 1):] == 0).all() or (v.sum() == t_txt - 1 + n_vis)
    # parked spec is empty
    assert int(out.spec.txt_end[0, 1]) <= int(out.spec.txt_start[0, 1])
