"""Instruction fine-tuning CLI — weighted multi-dataset mixture.

TPU-native counterpart of ``train/instruction_finetune.py`` (Hydra SFT):
the same knobs (``configs/sft.yaml``) in the unified YAML system —
``training_mode`` in {sft_scratch, sft_resume}, sampling weights, 50k-step
budget, prompt-masked labels from the data layer.

Usage:
    python -m aki_tpu.train.sft --config aki_tpu/configs/sft.yaml \
        [key.path=value ...]
"""

from __future__ import annotations

import argparse
import random

import jax

from ..configs.loader import load_config
from ..data.sft.pipeline import MultiDataset, SFTDataset, batches, worker_seed
from ..data.tokenizer import load_tokenizer
from ..models.configs import aki_4b, aki_tiny, config_for_tokenizer
from ..parallel.mesh import MeshConfig, init_distributed
from .runner import RunnerConfig, Trainer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    init_distributed()

    tokenizer = load_tokenizer(cfg.get("tokenizer_path"))
    base = aki_tiny(tokenizer.info.vocab_size) if cfg.get("tiny") else aki_4b()
    model_cfg = config_for_tokenizer(base, tokenizer.info)

    tc = cfg.training_config
    run_cfg = RunnerConfig(
        run_dir=tc.get("run_dir", "runs/sft"),
        learning_rate=tc.get("learning_rate", 2e-5),
        min_lr=tc.get("min_lr", 1e-6),
        weight_decay=tc.get("weight_decay", 1e-4),
        warmup_steps=tc.get("warmup_steps", 150),
        total_steps=tc.get("total_training_steps", 50000),
        lr_schedule=tc.get("lr_scheduler_type", "cosine"),
        grad_accum=tc.get("gradient_accumulation_steps", 1),
        accum_unroll=tc.get("accum_unroll", False),
        precision=tc.get("precision", "bf16"),
        remat=tc.get("gradient_checkpointing", True),
        checkpoint_steps=tc.get("checkpoint_steps", 1000),
        seed=tc.get("seed", 42),
        mesh=MeshConfig(**cfg.get("mesh", {"data": 1, "fsdp": -1, "tensor": 1})),
        decay_policy=tc.get("decay_policy", "all"),
        training_mode=tc.get("training_mode", "sft_scratch"),
        log_every=tc.get("log_every", 10),
        host_offload=tc.get("host_offload", False),
        fsdp_strategy=tc.get("fsdp_strategy", "full"),
        host_offload_params=tc.get("host_offload_params", False),
        pp_microbatches=tc.get("pp_microbatches"),
        moe_aux_weight=tc.get("moe_aux_weight", 0.01),
        frozen_bf16=tc.get("frozen_bf16", False),
    )
    trainer = Trainer(model_cfg, run_cfg)

    rank, world = jax.process_index(), jax.process_count()
    seed = worker_seed(run_cfg.seed, rank, 0)
    rng = random.Random(seed)

    datasets, weights = [], []
    for name, block in cfg.datasets.items():
        datasets.append(SFTDataset(
            block["classname"],
            dict(block["data_cfg"]),
            tokenizer,
            max_length=tc.get("max_length", 512),
            image_size=model_cfg.siglip.image_size,
            rng=rng,
        ))
        weights.append(block.get("weight", 1.0))

    batch_size = tc.get("batch_size_per_device", 4)
    sampling = tc.get("sampling_weights") or weights or "uniform"
    # configs/sft.yaml workers: 4 — capped so every worker owns >= 1 full
    # batch (tiny datasets would otherwise make zero-progress epochs)
    total_len = sum(len(d) for d in datasets) // max(world, 1)
    num_workers = max(1, min(tc.get("workers", 4),
                             total_len // max(batch_size, 1)))

    def make_epoch_iter(epoch_seed):
        def mk(w, n):
            # per-worker mixture over SHARED parsed records with private
            # RNG state; num_ranks scales so the epoch length splits
            rng_w = random.Random(worker_seed(epoch_seed, rank, w))
            ds_w = [d.clone_for_worker(rng_w) for d in datasets]
            mixture = MultiDataset(
                ds_w, sampling_weights=sampling,
                force_one_per_dataset=tc.get("force_one_per_dataset", False),
                batch_per_device=batch_size,
                num_ranks=world * n,
                seed=rng_w.randrange(2 ** 31),
            )
            return batches(
                mixture, batch_size, tokenizer.info.pad_id,
                tc.get("max_length", 512), model_cfg.siglip.image_size,
            )
        return mk

    from ..data.loader import make_loader

    epoch = trainer.epoch
    while int(trainer.state.step) < run_cfg.total_steps:
        before = int(trainer.state.step)
        it = make_loader(make_epoch_iter(run_cfg.seed + epoch),
                         num_workers=num_workers)
        trainer.run_epoch(it, epoch)
        epoch += 1
        if int(trainer.state.step) == before:
            print("warning: epoch produced no batches; stopping")
            break
    trainer.finish(epoch)
    print(f"done at step {int(trainer.state.step)}")


if __name__ == "__main__":
    main()
