"""LR schedules: warmup + {cosine-to-min_lr, linear, constant}.

``cosine_min_lr`` reproduces the reference's multiplier-rescaling trick
(``train/losses.py:10-40``): cosine that decays to ``min_lr`` instead of 0.
``linear`` / ``constant`` mirror the HF schedulers used by the SFT CLI
(``train/instruction_finetune.py:176-193``).
"""

from __future__ import annotations

import optax


def cosine_min_lr(peak_lr: float, min_lr: float, warmup_steps: int,
                  total_steps: int) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, peak_lr, max(warmup_steps, 1))
    decay = optax.cosine_decay_schedule(
        peak_lr, max(total_steps - warmup_steps, 1),
        alpha=min_lr / peak_lr if peak_lr > 0 else 0.0,
    )
    return optax.join_schedules([warmup, decay], [warmup_steps])


def linear(peak_lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, peak_lr, max(warmup_steps, 1))
    decay = optax.linear_schedule(
        peak_lr, 0.0, max(total_steps - warmup_steps, 1)
    )
    return optax.join_schedules([warmup, decay], [warmup_steps])


def constant(peak_lr: float, warmup_steps: int) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, peak_lr, max(warmup_steps, 1))
    return optax.join_schedules(
        [warmup, optax.constant_schedule(peak_lr)], [warmup_steps]
    )


def make_schedule(name: str, peak_lr: float, min_lr: float,
                  warmup_steps: int, total_steps: int) -> optax.Schedule:
    if name == "cosine":
        return cosine_min_lr(peak_lr, min_lr, warmup_steps, total_steps)
    if name == "linear":
        return linear(peak_lr, warmup_steps, total_steps)
    if name == "constant":
        return constant(peak_lr, warmup_steps)
    raise ValueError(f"unknown schedule: {name}")
