"""CLI + config-system integration tests (tiny geometry, synthetic data)."""

import io
import json
import tarfile

import numpy as np
import pytest
import yaml

from aki_tpu.configs.loader import load_config


def test_config_defaults_merge_and_interpolation(tmp_path):
    (tmp_path / "sft_datasets").mkdir()
    (tmp_path / "sft_datasets" / "a.yaml").write_text(yaml.safe_dump({
        "datasets": {"a": {"classname": "X",
                           "data_cfg": {"path": "${root}/a.json"}}}
    }))
    (tmp_path / "main.yaml").write_text(
        "defaults:\n  - sft_datasets: a\n  - _self_\n"
        "root: /data\ntraining: {lr: 1.0e-4}\n"
    )
    cfg = load_config(tmp_path / "main.yaml")
    assert cfg.datasets.a.data_cfg.path == "/data/a.json"
    assert cfg.training.lr == 1e-4


def test_config_cli_overrides(tmp_path):
    (tmp_path / "c.yaml").write_text("a: {b: 1}\nroot: /x\n")
    cfg = load_config(tmp_path / "c.yaml", ["a.b=7", "a.c=hello", "root=/y"])
    assert cfg.a.b == 7 and cfg.a.c == "hello" and cfg.root == "/y"


def test_repo_configs_load():
    cfg = load_config("aki_tpu/configs/sft.yaml")
    assert len(cfg.datasets) == 11
    assert cfg.datasets.llava150k.classname == "LLaVAInstructDataset"
    assert cfg.training_config.total_training_steps == 50000
    p = load_config("aki_tpu/configs/pretrain.yaml")
    assert "blip3_kale" in p.datasets
    assert "blip3-kale" in p.datasets.blip3_kale.shards


def _make_sft_fixture(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    ann = []
    for i in range(8):
        Image.new("RGB", (48, 48), (i * 20 % 255, 90, 10)).save(
            img_dir / f"{i}.jpg"
        )
        ann.append({
            "id": str(i), "image": f"{i}.jpg",
            "conversations": [
                {"from": "human", "value": f"<image>\nwhat color is item {i} ?"},
                {"from": "gpt", "value": f"color {i % 3}"},
            ],
        })
    (tmp_path / "llava.json").write_text(json.dumps(ann))

    (tmp_path / "sft_datasets").mkdir()
    (tmp_path / "sft_datasets" / "toy.yaml").write_text(yaml.safe_dump({
        "datasets": {"toy": {
            "classname": "LLaVAInstructDataset", "weight": 1.0,
            "data_cfg": {"data_path": "${root}/llava.json",
                         "image_path": "${root}/imgs"},
        }}
    }))
    (tmp_path / "sft.yaml").write_text(yaml.safe_dump({
        "defaults": [{"sft_datasets": "toy"}, "_self_"],
        "root": str(tmp_path),
        "tokenizer_path": None,
        "tiny": True,
        "mesh": {"data": 1, "fsdp": 4, "tensor": 2},
        "training_config": {
            "run_dir": str(tmp_path / "run"),
            "precision": "fp32",
            "learning_rate": 1e-3,
            "total_training_steps": 3,
            "max_length": 32,
            "batch_size_per_device": 4,
            "warmup_steps": 1,
            "checkpoint_steps": 2,
            "training_mode": "sft_scratch",
            "log_every": 1,
        },
    }))
    return tmp_path / "sft.yaml"


def test_sft_cli_end_to_end(tmp_path):
    """Run the real SFT CLI main() for 3 steps on the 8-device mesh."""
    from aki_tpu.train.sft import main

    cfg_path = _make_sft_fixture(tmp_path)
    main(["--config", str(cfg_path)])

    run_dir = tmp_path / "run"
    metrics = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 3
    assert all(np.isfinite(m["training_loss"]) for m in metrics)
    # checkpoints written at step 2 and final
    names = sorted(p.name for p in run_dir.glob("checkpoint_*"))
    assert names, "no checkpoints written"


def test_pretrain_cli_end_to_end(tmp_path):
    from PIL import Image
    from aki_tpu.train.pretrain import main

    shard = tmp_path / "shard-0000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(16):
            img = Image.new("RGB", (40, 40), (i * 9 % 255, 10, 30))
            b = io.BytesIO()
            img.save(b, format="JPEG")
            ti = tarfile.TarInfo(f"{i:05d}.jpg")
            ti.size = len(b.getvalue())
            tf.addfile(ti, io.BytesIO(b.getvalue()))
            txt = f"caption {i}".encode()
            ti = tarfile.TarInfo(f"{i:05d}.txt")
            ti.size = len(txt)
            tf.addfile(ti, io.BytesIO(txt))

    (tmp_path / "pt.yaml").write_text(yaml.safe_dump({
        "root": str(tmp_path),
        "tokenizer_path": None,
        "tiny": True,
        "mesh": {"data": 2, "fsdp": 2, "tensor": 2},
        "training": {
            "run_dir": str(tmp_path / "run_pt"),
            "precision": "fp32",
            "learning_rate": 1e-3,
            "total_steps": 2,
            "num_epochs": 1,
            "warmup_steps": 1,
            "checkpoint_steps": 10,
            "log_every": 1,
        },
        "datasets": {"blip3_kale": {
            "shards": str(shard), "batch_size": 8, "max_text_len": 16,
        }},
    }))
    main(["--config", str(tmp_path / "pt.yaml")])
    metrics = [
        json.loads(l)
        for l in (tmp_path / "run_pt" / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(metrics) == 2
    assert all(np.isfinite(m["training_loss"]) for m in metrics)


def test_torch_export_roundtrip():
    import jax
    from aki_tpu.convert.jax_to_torch import export_aki_checkpoint
    from aki_tpu.convert.torch_to_jax import convert_aki_checkpoint
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.configs import aki_tiny

    cfg = aki_tiny()
    params = init_aki(jax.random.PRNGKey(0), cfg)
    sd = export_aki_checkpoint(params)
    back = convert_aki_checkpoint(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(params["phi3"]["layers"]["wq"]), back["phi3"]["layers"]["wq"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["perceiver"]["latents"]), back["perceiver"]["latents"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]["w"]), back["lm_head"]["w"], rtol=1e-6,
    )


def test_cv_bench_prompt_and_letter():
    """Prompt must be byte-exact vs eval.py:54-64 + :167."""
    from aki_tpu.infer.eval_cv_bench import extract_letter, render_prompt
    from aki_tpu.data.sft.templates import SYSTEM_MESSAGE

    p = render_prompt("Which is bigger?", ["the cat", "the dog"])
    # verbatim reference transcription
    text_input = (
        "Answer with the option's letter from the given choices directly. "
        "Which is bigger?\nOptions:\nA. the cat\nB. the dog\n"
    )
    want = (
        f"<s> <|system|>\n{SYSTEM_MESSAGE}<|end|>\n"
        f"<|user|>\n<image>\n{text_input}<|end|>\n<|assistant|>\n"
    )
    assert p == want
    assert extract_letter("(B)") == "B"
    assert extract_letter(" B. the dog") == "B"
    assert extract_letter("no letter") is None


def test_cv_bench_bucketed_batched_eval():
    """run_eval compiles O(buckets), handles mixed lengths + partial
    batches, and routes predictions back to the right samples."""
    import jax
    from aki_tpu.data.tokenizer import HashTokenizer
    from aki_tpu.infer.eval_cv_bench import pick_bucket, run_eval
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import F32
    from aki_tpu.models.configs import aki_tiny, config_for_tokenizer

    assert pick_bucket(90) == 96 and pick_bucket(97) == 128

    tok = HashTokenizer()
    cfg = config_for_tokenizer(aki_tiny(tok.info.vocab_size), tok.info)
    params = init_aki(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    s = cfg.siglip.image_size
    samples = []
    for n in (20, 30, 100, 110, 25):  # two buckets, partial batches
        ids = rng.randint(8, cfg.initial_tokenizer_len - 1, size=n).tolist()
        ids[1] = cfg.media_token_id
        ids[n // 2] = cfg.assistant_token_id
        samples.append({
            "ids": ids,
            "image": rng.randn(s, s, 3).astype(np.float32),
            "answer": "A", "source": "COCO",
        })
    preds = run_eval(params, cfg, tok, samples, batch_size=2,
                     max_new_tokens=3, policy=F32)
    assert len(preds) == 5 and all(isinstance(p, str) for p in preds)


def test_akimodel_from_pretrained_and_answer(tmp_path):
    """High-level API: from_pretrained on a run dir + chat answer."""
    import io
    import jax
    import optax
    from PIL import Image
    from aki_tpu.models.modeling import AKIModel
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.configs import aki_tiny, config_for_tokenizer
    from aki_tpu.data.tokenizer import HashTokenizer
    from aki_tpu.train.checkpoints import CheckpointManager
    from aki_tpu.train.step import TrainState

    tok = HashTokenizer()
    cfg = config_for_tokenizer(aki_tiny(tok.info.vocab_size), tok.info)
    params = init_aki(jax.random.PRNGKey(5), cfg)
    state = TrainState.create(params, optax.sgd(0.0))
    CheckpointManager(str(tmp_path)).save(state, epoch=0, step=3)

    m = AKIModel.from_pretrained(str(tmp_path), tiny=True)
    m = type(m)(params=m.params, cfg=m.cfg, tokenizer=m.tokenizer,
                max_len=128)
    # restored weights match
    np.testing.assert_allclose(
        np.asarray(m.params["phi3"]["layers"]["wq"]),
        np.asarray(params["phi3"]["layers"]["wq"]),
    )
    buf = io.BytesIO()
    Image.new("RGB", (64, 64), (10, 200, 30)).save(buf, format="PNG")
    text = m.answer(buf.getvalue(), "what color is this ?", max_new_tokens=4)
    assert isinstance(text, str)


def test_vlmevalkit_adapter_generates(tmp_path):
    """The VLMEvalKit duck-type surface: message list in, string out."""
    from PIL import Image
    from aki_tpu.infer.vlmevalkit import AKIVLMEval

    img_path = tmp_path / "x.jpg"
    Image.new("RGB", (64, 64), (10, 200, 30)).save(img_path)
    m = AKIVLMEval(tiny=True, max_new_tokens=3, max_len=96)
    assert m.use_custom_prompt("MMBench") is False
    out = m.generate([
        {"type": "image", "value": str(img_path)},
        {"type": "text", "value": "What color is this?"},
    ])
    assert isinstance(out, str)


def test_pretrain_cli_mixed_paired_interleaved(tmp_path):
    """Multi-dataset pretrain step over a paired + an interleaved (MMC4)
    dataset: one optimizer step consumes one batch from each, multi-image
    batches flow through the interleaved splice."""
    import base64

    from PIL import Image
    from aki_tpu.train.pretrain import main

    # paired shard
    shard = tmp_path / "pair-0000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(16):
            img = Image.new("RGB", (40, 40), (i * 9 % 255, 10, 30))
            b = io.BytesIO()
            img.save(b, format="JPEG")
            ti = tarfile.TarInfo(f"{i:05d}.jpg")
            ti.size = len(b.getvalue())
            tf.addfile(ti, io.BytesIO(b.getvalue()))
            txt = f"caption {i}".encode()
            ti = tarfile.TarInfo(f"{i:05d}.txt")
            ti.size = len(txt)
            tf.addfile(ti, io.BytesIO(txt))

    # interleaved shard (mmc4-style json samples)
    def b64_img(color):
        img = Image.new("RGB", (48, 48), color)
        b = io.BytesIO()
        img.save(b, format="PNG")
        return base64.b64encode(b.getvalue() + b"\0" * 8000).decode()

    mshard = tmp_path / "mmc4-0000.tar"
    with tarfile.open(mshard, "w") as tf:
        for i in range(12):
            info = {
                "text_list": [f"sentence {i} one", f"sentence {i} two"],
                "similarity_matrix": [[0.9, 0.1]],
                "image_info": [{"image_base64": b64_img((i * 9 % 255, 5, 5))}],
            }
            payload = json.dumps(info).encode()
            ti = tarfile.TarInfo(f"{i:05d}.json")
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))

    (tmp_path / "pt.yaml").write_text(yaml.safe_dump({
        "root": str(tmp_path),
        "tokenizer_path": None,
        "tiny": True,
        "mesh": {"data": 2, "fsdp": 2, "tensor": 2},
        "training": {
            "run_dir": str(tmp_path / "run_mixed"),
            "precision": "fp32",
            "learning_rate": 1e-3,
            "total_steps": 2,
            "num_epochs": 1,
            "warmup_steps": 1,
            "checkpoint_steps": 10,
            "log_every": 1,
            "workers": 1,
        },
        "datasets": {
            "blip3_kale": {
                "shards": str(shard), "batch_size": 4, "max_text_len": 16,
            },
            "mmc4": {
                "type": "interleaved",
                # batch must divide the data x fsdp axes (GSPMD sharding)
                "shards": str(mshard), "batch_size": 4, "max_text_len": 48,
                "max_num_images": 2,
            },
        },
    }))
    main(["--config", str(tmp_path / "pt.yaml")])
    metrics = [
        json.loads(l) for l in
        (tmp_path / "run_mixed" / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(metrics) == 2
    assert all(np.isfinite(m["training_loss"]) for m in metrics)
