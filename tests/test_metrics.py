"""Metrics logger, profiler hook, hybrid mesh fallback."""

import json

import numpy as np

from aki_tpu.train.metrics import AverageMeter, MetricsLogger, ProfilerHook


def test_metrics_logger_jsonl_and_tb(tmp_path):
    m = MetricsLogger(str(tmp_path), use_tensorboard=True, is_main=True)
    m.log(1, training_loss=2.5, learning_rate=1e-4)
    m.log(2, training_loss=2.0, learning_rate=9e-5)
    m.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [l["step"] for l in lines] == [1, 2]
    assert lines[0]["training_loss"] == 2.5
    # TB event files written (torch TB available in the image)
    assert list((tmp_path / "tb").glob("events.*"))


def test_metrics_logger_non_main_writes_nothing(tmp_path):
    m = MetricsLogger(str(tmp_path), is_main=False)
    m.log(1, training_loss=1.0)
    m.close()
    assert not (tmp_path / "metrics.jsonl").exists()


def test_average_meter():
    a = AverageMeter()
    a.update(2.0)
    a.update(4.0)
    assert a.avg == 3.0 and a.val == 4.0


def test_profiler_hook(tmp_path):
    import jax
    import jax.numpy as jnp

    hook = ProfilerHook(str(tmp_path), start_step=2, num_steps=1)
    x = jnp.ones((8, 8))
    for step in range(5):
        hook.step(step)
        x = (x @ x).block_until_ready()
    traces = list((tmp_path / "profile").rglob("*"))
    assert traces, "no profiler trace written"


def test_hybrid_mesh_falls_back_on_cpu():
    from aki_tpu.parallel.mesh import MeshConfig, create_mesh

    m = create_mesh(MeshConfig(data=2, fsdp=4, tensor=1, data_on_dcn=True))
    shape = dict(m.shape)
    assert shape["data"] == 2 and shape["fsdp"] == 4 and shape["tensor"] == 1
    # new axes (seq/pipe/expert) default to 1
    assert all(shape[a] == 1 for a in ("seq", "pipe", "expert"))
