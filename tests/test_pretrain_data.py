"""Pretrain webdataset pipeline: tar reading, shuffling, splitting, batching."""

import io
import json
import random
import tarfile

import numpy as np
from PIL import Image

from aki_tpu.data.pretrain import (
    PretrainConfig, batches, caption_text, parse_caption, Prefetcher,
)
from aki_tpu.data.tar_reader import (
    brace_expand, det_shuffle, iter_tar_samples, shard_sample_stream,
    shuffled, split_by_rank_worker,
)
from aki_tpu.data.tokenizer import HashTokenizer


def make_shard(path, n, prefix="s", broken_tail=False):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.new("RGB", (40, 40), (i * 5 % 255, 10, 30))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{prefix}{i:04d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"caption number {i}".encode()
            info = tarfile.TarInfo(f"{prefix}{i:04d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))
    if broken_tail:
        with open(path, "ab") as f:
            f.write(b"GARBAGE" * 10)


def test_brace_expand():
    assert brace_expand("shard-{0000..0002}.tar") == [
        "shard-0000.tar", "shard-0001.tar", "shard-0002.tar",
    ]
    assert brace_expand("plain.tar") == ["plain.tar"]


def test_tar_grouping(tmp_path):
    p = tmp_path / "a.tar"
    make_shard(p, 5)
    samples = list(iter_tar_samples(str(p)))
    assert len(samples) == 5
    assert all("jpg" in s and "txt" in s for s in samples)
    assert samples[0]["__key__"] == "s0000"


def test_corrupt_tar_swallowed(tmp_path):
    p = tmp_path / "b.tar"
    make_shard(p, 3, broken_tail=False)
    # truncate mid-file
    data = p.read_bytes()
    p.write_bytes(data[: len(data) // 2])
    samples = list(iter_tar_samples(str(p)))  # must not raise
    assert len(samples) >= 0


def test_det_shuffle_reproducible():
    items = list(range(20))
    a = det_shuffle(items, epoch=3, seed=7)
    b = det_shuffle(items, epoch=3, seed=7)
    c = det_shuffle(items, epoch=4, seed=7)
    assert a == b and a != c and sorted(a) == items


def test_rank_worker_split_partition():
    shards = [f"s{i}" for i in range(12)]
    got = []
    for rank in range(2):
        for worker in range(3):
            got += split_by_rank_worker(shards, rank, 2, worker, 3)
    assert sorted(got) == sorted(shards)  # exact partition, no overlap


def test_shuffle_buffer_is_permutation():
    rng = random.Random(0)
    out = list(shuffled(iter(range(50)), bufsize=8, rng=rng))
    assert sorted(out) == list(range(50)) and out != list(range(50))


def test_caption_parsing():
    # structure-exact vs data.py:77-94
    assert parse_caption({"txt": b" hello world "}, "blip3_kale") == "hello world"
    grounding = {"txt": repr([["a dog", 1, True]]).encode()}
    assert parse_caption(grounding, "blip3_grounding_50m") == "a dog"
    ocr = {"txt": json.dumps([{"x": 0}, {"text": " text here "}]).encode()}
    assert parse_caption(ocr, "blip3_ocr_200m") == "text here"
    # unparseable payloads skip the sample, not fall back to raw text
    assert parse_caption({"txt": b"not a list"}, "blip3_grounding_50m") is None
    assert parse_caption({"txt": b"not json"}, "blip3_ocr_200m") is None
    assert caption_text(" cap ") == "<image>cap<|endofchunk|>"


def test_pretrain_batches(tmp_path):
    p = tmp_path / "shard-0000.tar"
    make_shard(p, 20)
    tok = HashTokenizer()
    cfg = PretrainConfig(
        shards=str(p), batch_size=4, max_text_len=16, image_size=28,
        shuffle_buffer=4,
    )
    bs = list(batches(cfg, tok))
    assert len(bs) == 5
    b0 = bs[0]
    assert b0.input_ids.shape == (4, 16)
    assert b0.images.shape == (4, 28, 28, 3)
    # media + eoc tokens present
    assert (b0.input_ids == tok.info.media_id).sum() == 4
    # labels: pads masked
    assert np.all(b0.labels[b0.attn_valid == 0] == -100)
    assert np.all(b0.labels[b0.attn_valid == 1] == b0.input_ids[b0.attn_valid == 1])


def test_prefetcher(tmp_path):
    it = iter(range(10))
    pf = Prefetcher(it, depth=2)
    assert list(pf) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("die")

    pf = Prefetcher(boom(), depth=2)
    out = []
    try:
        for x in pf:
            out.append(x)
        raise AssertionError("should have raised")
    except RuntimeError:
        pass
    assert out == [1]


def test_dataset_size_metadata(tmp_path):
    import json
    from aki_tpu.data.tar_reader import dataset_size

    for i in range(3):
        make_shard(tmp_path / f"shard-{i:04d}.tar", 4)
    pattern = str(tmp_path / "shard-{0000..0002}.tar")
    assert dataset_size(pattern) is None  # no metadata yet
    (tmp_path / "sizes.json").write_text(json.dumps({
        f"shard-{i:04d}.tar": 4 for i in range(3)
    }))
    assert dataset_size(pattern) == 12
    (tmp_path / "sizes.json").unlink()
    (tmp_path / "__len__").write_text("11")
    assert dataset_size(pattern) == 11
