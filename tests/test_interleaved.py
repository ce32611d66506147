"""Interleaved MMC4-style pipeline + multi-image model forward."""

import base64
import io
import json
import tarfile

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from aki_tpu.data.interleaved import (
    InterleavedConfig, batches, preprocess_interleaved,
)
from aki_tpu.data.tokenizer import HashTokenizer

TOK = HashTokenizer()


def b64_image(size=(64, 64), color=(200, 30, 40), big=True):
    img = Image.new("RGB", size, color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    data = buf.getvalue()
    if big:  # pass the >=10KB filter
        data += b"\0" * (12_000 - len(data)) if len(data) < 12_000 else b""
    return base64.b64encode(data).decode()


def make_info(n_sent=4, n_img=2, sim_hi=0.9):
    sents = [f"sentence number {i} content" for i in range(n_sent)]
    sim = np.full((n_img, n_sent), 0.01)
    for i in range(n_img):
        sim[i, i] = sim_hi  # image i matches sentence i
    return {
        "text_list": sents,
        "similarity_matrix": sim.tolist(),
        "image_info": [{"image_base64": b64_image(color=(i * 50, 20, 20))}
                       for i in range(n_img)],
    }


def test_matching_and_token_layout():
    cfg = InterleavedConfig(shards="x", image_size=28, max_tokens=64,
                            max_num_images=3)
    rng = np.random.RandomState(0)
    imgs, ids = preprocess_interleaved(make_info(), TOK, cfg, rng)
    assert imgs.shape == (3, 28, 28, 3)       # padded to max_num_images
    assert (imgs[2] == 0).all()               # zero padding
    media = TOK.info.media_id
    eoc = TOK.info.end_of_chunk_id
    assert sum(1 for t in ids if t == media) == 2
    # first media has no eoc before it; second does
    first = ids.index(media)
    assert eoc not in ids[:first]
    assert ids[-1] == TOK.info.eos_id or TOK.info.eos_id in ids


def test_threshold_filters_images():
    cfg = InterleavedConfig(shards="x", image_size=28, sim_threshold=0.95)
    rng = np.random.RandomState(0)
    info = make_info(sim_hi=0.9)  # below threshold
    try:
        preprocess_interleaved(info, TOK, cfg, rng)
        raise AssertionError("should reject all images")
    except ValueError:
        pass


def test_small_images_filtered():
    cfg = InterleavedConfig(shards="x", image_size=28)
    rng = np.random.RandomState(0)
    info = make_info(n_img=1)
    # shrink the image payload below 10KB
    img = Image.new("RGB", (8, 8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    info["image_info"][0]["image_base64"] = base64.b64encode(buf.getvalue()).decode()
    try:
        preprocess_interleaved(info, TOK, cfg, rng)
        raise AssertionError("should reject small images")
    except ValueError:
        pass


def test_batches_from_tar(tmp_path):
    shard = tmp_path / "mmc4-0000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(6):
            payload = json.dumps(make_info()).encode()
            ti = tarfile.TarInfo(f"{i:05d}.json")
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
    cfg = InterleavedConfig(shards=str(shard), batch_size=2, image_size=28,
                            max_tokens=64, max_num_images=2, shuffle_buffer=1)
    bs = list(batches(cfg, TOK))
    assert len(bs) == 3
    assert bs[0].images.shape == (2, 2, 28, 28, 3)
    assert np.all(bs[0].labels[bs[0].attn_valid == 0] == -100)


def test_multi_image_model_forward():
    from aki_tpu.models.aki import aki_forward, init_aki
    from aki_tpu.models.common import F32
    from aki_tpu.models.configs import aki_tiny, config_for_tokenizer

    cfg = config_for_tokenizer(aki_tiny(TOK.info.vocab_size), TOK.info)
    params = init_aki(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, t, n_img = 2, 16, 2
    ids = rng.randint(8, cfg.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = cfg.media_token_id
    ids[:, 7] = cfg.media_token_id
    valid = np.ones((b, t), np.int32)
    labels = ids.copy()
    s = cfg.siglip.image_size
    imgs = rng.randn(b, n_img, s, s, 3).astype(np.float32)

    out = aki_forward(params, cfg, jnp.array(ids), jnp.array(imgs),
                      jnp.array(valid), labels=jnp.array(labels),
                      policy=F32, use_flash=False)
    n_vis = cfg.perceiver.num_latents
    t_full = t + n_img * (n_vis - 1)
    assert out.logits.shape == (b, t_full, cfg.output_vocab)
    assert np.isfinite(float(out.loss))
    assert out.spliced.spec.img_start.shape == (b, n_img)
