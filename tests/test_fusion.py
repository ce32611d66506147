"""Splice tests against a per-sample numpy oracle that mirrors the
reference's Python-loop splice (vlm.py:445-603)."""

import numpy as np
import jax.numpy as jnp

from aki_tpu.models.fusion import (
    IGNORE_INDEX,
    collapse_logits,
    splice_vision_tokens,
)

MEDIA, ASSIST, PAD = 900, 901, 0


def oracle_splice(ids, embeds, vis, labels, valid):
    """Reference algorithm, sample by sample (vlm.py:486-581)."""
    t_txt, d = embeds.shape
    n_vis = vis.shape[0]
    img_pos = np.where(ids == MEDIA)[0]
    asst = np.where(ids == ASSIST)[0]
    asst = int(asst[0]) if len(asst) else 0
    if len(img_pos) == 0:
        return dict(
            embeds=embeds, labels=labels, valid=valid,
            spec=(0, 0, asst), t=t_txt,
        )
    p = int(img_pos[0])
    new_embeds = np.concatenate([embeds[:p], vis, embeds[p + 1:]], 0)
    new_labels = np.concatenate(
        [labels[:p], np.full(n_vis, IGNORE_INDEX), labels[p + 1:]], 0
    )
    new_valid = np.concatenate([valid[:p], np.ones(n_vis, int), valid[p + 1:]], 0)
    return dict(
        embeds=new_embeds, labels=new_labels, valid=new_valid,
        spec=(p, p + n_vis, asst + n_vis), t=t_txt + n_vis - 1,
    )


def make_batch(rng, t_txt=12, n_vis=4, d=8, with_image=(True, True)):
    b = len(with_image)
    ids = rng.randint(5, 100, size=(b, t_txt))
    valid = np.ones((b, t_txt), int)
    for i, has in enumerate(with_image):
        if has:
            ids[i, 2] = MEDIA
        ids[i, 7] = ASSIST
        valid[i, t_txt - 2:] = 0  # right padding
    labels = rng.randint(5, 100, size=(b, t_txt))
    embeds = rng.randn(b, t_txt, d).astype(np.float32)
    vis = rng.randn(b, n_vis, d).astype(np.float32)
    return ids, valid, labels, embeds, vis


def test_splice_matches_oracle():
    rng = np.random.RandomState(1)
    ids, valid, labels, embeds, vis = make_batch(rng)
    out = splice_vision_tokens(
        jnp.array(embeds), jnp.array(vis), jnp.array(ids), jnp.array(valid),
        MEDIA, ASSIST, labels=jnp.array(labels),
    )
    for i in range(len(ids)):
        o = oracle_splice(ids[i], embeds[i], vis[i], labels[i], valid[i])
        t = o["t"]
        np.testing.assert_allclose(np.asarray(out.embeds[i])[:t], o["embeds"])
        np.testing.assert_array_equal(np.asarray(out.labels[i])[:t], o["labels"])
        np.testing.assert_array_equal(
            np.asarray(out.attn_valid[i])[:t], o["valid"]
        )
        assert (
            int(out.spec.img_start[i]),
            int(out.spec.txt_start[i]),
            int(out.spec.txt_end[i]),
        ) == o["spec"]


def test_splice_no_image_sample():
    rng = np.random.RandomState(2)
    ids, valid, labels, embeds, vis = make_batch(rng, with_image=(False, True))
    out = splice_vision_tokens(
        jnp.array(embeds), jnp.array(vis), jnp.array(ids), jnp.array(valid),
        MEDIA, ASSIST, labels=jnp.array(labels),
    )
    # Row 0 has no image: text occupies the head, tail slots invalid.
    t_txt = ids.shape[1]
    o = oracle_splice(ids[0], embeds[0], vis[0], labels[0], valid[0])
    np.testing.assert_allclose(np.asarray(out.embeds[0])[:t_txt], o["embeds"])
    np.testing.assert_array_equal(np.asarray(out.attn_valid[0])[t_txt:], 0)
    assert (
        int(out.spec.img_start[0]),
        int(out.spec.txt_start[0]),
        int(out.spec.txt_end[0]),
    ) == o["spec"]


def test_collapse_logits_roundtrip():
    rng = np.random.RandomState(3)
    ids, valid, labels, embeds, vis = make_batch(rng)
    out = splice_vision_tokens(
        jnp.array(embeds), jnp.array(vis), jnp.array(ids), jnp.array(valid),
        MEDIA, ASSIST, labels=jnp.array(labels),
    )
    # Fake "logits" = the spliced embeddings themselves; collapsing must give
    # back text embeddings (with the <image> slot replaced by vis[0]).
    collapsed = np.asarray(collapse_logits(out.embeds, out.text_pos))
    for i in range(len(ids)):
        img = np.where(ids[i] == MEDIA)[0][0]
        want = embeds[i].copy()
        want[img] = vis[i, 0]
        np.testing.assert_allclose(collapsed[i], want)


def test_dot_text_first_ordering():
    rng = np.random.RandomState(4)
    ids, valid, labels, embeds, vis = make_batch(rng, with_image=(True,))
    out = splice_vision_tokens(
        jnp.array(embeds), jnp.array(vis), jnp.array(ids), jnp.array(valid),
        MEDIA, ASSIST, labels=jnp.array(labels), order="text_first",
    )
    # causal spec
    assert int(out.spec.txt_end[0]) <= int(out.spec.txt_start[0])
    got = np.asarray(out.embeds[0])
    img, asst = 2, 7
    # layout: text-without-<image> through <|assistant|>, then vision
    want_head = np.concatenate([embeds[0, :img], embeds[0, img + 1: asst + 1]], 0)
    n_head = want_head.shape[0]
    np.testing.assert_allclose(got[:n_head], want_head)
    np.testing.assert_allclose(got[n_head: n_head + vis.shape[1]], vis[0])
    np.testing.assert_allclose(
        got[n_head + vis.shape[1]:], embeds[0, asst + 1:]
    )
    # labels on the vision block are ignored
    np.testing.assert_array_equal(
        np.asarray(out.labels[0])[n_head: n_head + vis.shape[1]], IGNORE_INDEX
    )
