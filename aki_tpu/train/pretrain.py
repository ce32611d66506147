"""Pretraining CLI — webdataset image-caption shards, multi-dataset capable.

TPU-native counterpart of ``train/train.py``: the per-dataset knobs
(batch size, loss multiplier, sample budget, shard globs,
``train.py:100-116``) live under ``datasets:`` blocks in one YAML.
Multi-dataset stepping is reference-exact: one optimizer step consumes one
batch from every dataset and their (weighted) gradients sum before the
update (``zip(*dataloaders)`` + per-dataset backward,
``train_utils.py:215-252``).

Usage:
    python -m aki_tpu.train.pretrain --config aki_tpu/configs/pretrain.yaml \
        [key.path=value ...]
"""

from __future__ import annotations

import argparse

import jax

import dataclasses

from ..configs.loader import load_config
from ..data.loader import make_loader
from ..data.pretrain import PretrainConfig, batches
from ..data.tokenizer import load_tokenizer
from ..models.configs import aki_4b, aki_tiny, config_for_tokenizer
from ..parallel.mesh import MeshConfig, init_distributed
from .runner import RunnerConfig, Trainer


def build_model_cfg(cfg, tokenizer):
    base = aki_tiny(tokenizer.info.vocab_size) if cfg.get("tiny") else aki_4b()
    return config_for_tokenizer(base, tokenizer.info)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    init_distributed()

    tokenizer = load_tokenizer(cfg.get("tokenizer_path"))
    model_cfg = build_model_cfg(cfg, tokenizer)

    tc = cfg.training
    run_cfg = RunnerConfig(
        run_dir=tc.get("run_dir", "runs/pretrain"),
        learning_rate=tc.get("learning_rate", 1e-4),
        min_lr=tc.get("min_lr", 1e-5),
        weight_decay=tc.get("weight_decay", 0.01),
        warmup_steps=tc.get("warmup_steps", 2000),
        total_steps=tc.get("total_steps", 100000),
        lr_schedule=tc.get("lr_scheduler", "cosine"),
        grad_accum=tc.get("gradient_accumulation_steps", 1),
        accum_unroll=tc.get("accum_unroll", False),
        precision=tc.get("precision", "bf16"),
        remat=tc.get("gradient_checkpointing", True),
        checkpoint_steps=tc.get("checkpoint_steps", 1000),
        keep_last_checkpoints=(
            1 if tc.get("delete_previous_checkpoint") else None
        ),
        seed=tc.get("seed", 42),
        mesh=MeshConfig(**cfg.get("mesh", {"data": 1, "fsdp": -1, "tensor": 1})),
        decay_policy=tc.get("decay_policy", "all"),
        training_mode=tc.get("training_mode", "resume"),
        log_every=tc.get("log_every", 10),
        host_offload=tc.get("host_offload", False),
        fsdp_strategy=tc.get("fsdp_strategy", "full"),
        host_offload_params=tc.get("host_offload_params", False),
        pp_microbatches=tc.get("pp_microbatches"),
        moe_aux_weight=tc.get("moe_aux_weight", 0.01),
        frozen_bf16=tc.get("frozen_bf16", False),
    )
    trainer = Trainer(model_cfg, run_cfg)

    # dataset-type routing (reference get_dataset_fn, data.py:441-449):
    # paired captions vs interleaved (MMC4-style) — declared per-dataset
    # via `type: interleaved` (or the mmc4 name, like SUPPORTED_DATASETS)
    from ..data.interleaved import InterleavedConfig
    from ..data.interleaved import batches as interleaved_batches

    ds_cfgs: list[tuple[object, object]] = []  # (cfg, batches_fn)
    for name, d in cfg.datasets.items():
        kind = d.get("type", "interleaved" if "mmc4" in name else "paired")
        if kind == "interleaved":
            ds_cfgs.append((InterleavedConfig(
                shards=d["shards"],
                batch_size=d.get("batch_size", 4),
                max_tokens=d.get("max_text_len", 256),
                image_size=model_cfg.siglip.image_size,
                sim_threshold=d.get("mmc4_textsim_threshold", 0.24),
                min_num_images=d.get("min_num_images", 1),
                max_num_images=d.get("max_num_images", 6),
                seed=run_cfg.seed,
                loss_multiplier=d.get("loss_multiplier", 1.0),
            ), interleaved_batches))
        else:
            ds_cfgs.append((PretrainConfig(
                shards=d["shards"],
                batch_size=d.get("batch_size", 8),
                max_text_len=d.get("max_text_len", 128),
                image_size=model_cfg.siglip.image_size,
                dataset_name=name,
                seed=run_cfg.seed,
                num_samples=d.get("train_num_samples"),
                resampled=d.get("resampled", False),
                loss_multiplier=d.get("loss_multiplier", 1.0),
            ), batches))

    epochs = tc.get("num_epochs", 1)
    rank, world = jax.process_index(), jax.process_count()
    for epoch in range(trainer.epoch, epochs):
        # one loader per dataset; ONE optimizer step consumes one batch
        # from EVERY dataset (reference zip(*dataloaders) + per-dataset
        # backward accumulation, train_utils.py:215-252; train.py:233-240
        # asserts equal batch counts — zip stops at the shortest)
        num_workers = tc.get("workers", 4)  # reference: 4 workers/GPU

        def make_ds_iter(dc, batches_fn, ep=epoch):
            def mk(w, n):
                cfg_w = dc
                if getattr(dc, "num_samples", None):
                    # split the budget with the remainder spread over the
                    # first workers — a plain // floors small budgets to 0
                    # and the epoch silently trains nothing
                    share = dc.num_samples // n + (
                        1 if w < dc.num_samples % n else 0
                    )
                    cfg_w = dataclasses.replace(dc, num_samples=share)
                return batches_fn(cfg_w, tokenizer, epoch=ep, rank=rank,
                                  world=world, worker=w, num_workers=n)
            return mk

        iters = [
            make_loader(make_ds_iter(dc, fn), num_workers=num_workers)
            for dc, fn in ds_cfgs
        ]
        stream = iters[0] if len(iters) == 1 else zip(*iters)
        step = trainer.run_epoch(stream, epoch)
        if step >= run_cfg.total_steps:
            break
    trainer.finish(epoch)
    print(f"done at step {int(trainer.state.step)}")


if __name__ == "__main__":
    main()
