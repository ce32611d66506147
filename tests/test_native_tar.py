"""Native C++ tar indexer: parity with Python tarfile + throughput sanity."""

import io
import tarfile
import time

import pytest

from aki_tpu.data.native_tar import (
    NativeTarShard, iter_samples, native_available,
)


def make_shard(path, n=50, long_name=False):
    with tarfile.open(path, "w", format=tarfile.GNU_FORMAT) as tf:
        for i in range(n):
            name = f"{i:05d}.jpg" if not long_name else (
                "deep/" * 20 + f"very_long_name_{i:05d}.jpg"
            )
            data = bytes([i % 256]) * (100 + i * 7)
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            txt = f"text {i}".encode()
            ti = tarfile.TarInfo(name.replace(".jpg", ".txt"))
            ti.size = len(txt)
            tf.addfile(ti, io.BytesIO(txt))


def test_native_index_matches_tarfile(tmp_path):
    p = tmp_path / "s.tar"
    make_shard(p)
    shard = NativeTarShard(str(p))
    with tarfile.open(p) as tf:
        want = [(m.name, m.offset_data, m.size) for m in tf if m.isfile()]
    assert shard.entries == want

    # reads are byte-identical
    name, off, size = shard.entries[7]
    with open(p, "rb") as f:
        f.seek(off)
        want_bytes = f.read(size)
    assert shard.read(off, size) == want_bytes


@pytest.mark.skipif(not native_available(), reason="no g++")
def test_native_long_names(tmp_path):
    p = tmp_path / "long.tar"
    make_shard(p, n=3, long_name=True)
    shard = NativeTarShard(str(p))
    with tarfile.open(p) as tf:
        want = [(m.name, m.offset_data, m.size) for m in tf if m.isfile()]
    assert shard.entries == want


def test_iter_samples_grouping(tmp_path):
    p = tmp_path / "s.tar"
    make_shard(p, n=10)
    samples = list(iter_samples(str(p)))
    assert len(samples) == 10
    assert all("jpg" in s and "txt" in s for s in samples)
    assert samples[3]["txt"] == b"text 3"


@pytest.mark.skipif(not native_available(), reason="no g++")
def test_native_is_used(tmp_path):
    p = tmp_path / "s.tar"
    make_shard(p, n=5)
    shard = NativeTarShard(str(p))
    assert shard._handle is not None  # really the native path
