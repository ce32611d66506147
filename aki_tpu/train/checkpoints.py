"""Checkpoint save/resume with the reference's selection & filter semantics.

Reference behaviors reproduced (``train/train_utils.py:314-461``):

- checkpoints named ``checkpoint_{epoch}_{step}`` under the run dir;
- auto-resume picks the newest by step index (``:314-327``);
- the frozen vision encoder is **excluded** from model state
  (``:376-410``) but embeddings are kept even when frozen;
- optimizer + schedule state (here: the whole optax state + step counter)
  saved alongside;
- ``keep_last``/delete-previous GC (``--delete_previous_checkpoint``);
- on restore, perceiver latents are re-initialized if the shape mismatches
  (``:346-349``) and missing keys fall back to the init values
  (``strict=False``).

Storage is orbax (sharding-aware, async-capable) instead of a rank-0
``torch.save`` — multi-host TPU jobs write shards in parallel and restore
onto any mesh.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

FROZEN_SUBTREES = ("siglip",)


def split_frozen(params: dict) -> tuple[dict, dict]:
    """(savable, frozen) — frozen subtrees are dropped from checkpoints."""
    savable = {k: v for k, v in params.items() if k not in FROZEN_SUBTREES}
    frozen = {k: v for k, v in params.items() if k in FROZEN_SUBTREES}
    return savable, frozen


@dataclasses.dataclass
class CheckpointManager:
    """Step checkpoints under ``run_dir`` with reference naming/GC."""

    run_dir: str
    keep_last: int | None = None   # None = keep all (delete_previous => 1)

    def __post_init__(self):
        self.path = Path(self.run_dir).absolute()
        self.path.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- discovery ---------------------------------------------------------
    def list_checkpoints(self) -> list[tuple[int, int, Path]]:
        """[(epoch, step, path)] sorted by (step, epoch)."""
        out = []
        for p in self.path.glob("checkpoint_*"):
            m = re.fullmatch(r"checkpoint_(\d+)(?:_(\d+))?", p.name)
            if m:
                out.append((int(m.group(1)), int(m.group(2) or 0), p))
        return sorted(out, key=lambda t: (t[1], t[0]))

    def latest(self) -> Path | None:
        cks = self.list_checkpoints()
        return cks[-1][2] if cks else None

    # -- save / restore ------------------------------------------------------
    def save(self, state: Any, epoch: int, step: int | None = None,
             include_frozen: bool = False) -> Path:
        """Save. **Collective**: on a multi-host mesh every process must
        call this (each host writes its array shards; orbax coordinates
        commit). Callers must NOT gate it on ``process_index() == 0`` —
        that deadlocks. GC of old checkpoints runs on process 0 only.

        ``include_frozen=True`` keeps the frozen subtrees (the SigLIP
        tower) in the payload. Training checkpoints drop them (reference
        parity: the vision encoder is filtered out, train_utils.py:376-410,
        and a training run restores it from its own init) — but an
        IMPORTED run dir is a distribution artifact whose consumers
        (eval/demo ``load_params``, ``AKIModel.from_pretrained``) init the
        tower RANDOMLY, so ``convert.cli.import_checkpoint`` must ship it
        or every downstream restore silently serves a random vision
        tower."""
        name = f"checkpoint_{epoch}" + (f"_{step}" if step is not None else "")
        target = self.path / name
        if include_frozen:
            savable_params = state.params
        else:
            savable_params, _ = split_frozen(state.params)
        payload = {
            "params": savable_params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.asarray(epoch, np.int32),
        }
        if jax.process_count() > 1:
            # host-local leaves (the step counter, optax count scalars —
            # anything not placed on the global mesh) cannot serialize as
            # jax.Arrays in a multi-host job; hand them to orbax as numpy
            # (treated as replicated, written by the primary only)
            def to_host(x):
                if isinstance(x, jax.Array) and x.is_fully_addressable:
                    return np.asarray(x)
                return x

            payload = jax.tree.map(to_host, payload)
        self._ckptr.save(target, payload)
        self._ckptr.wait_until_finished()
        self._gc(keep=target)
        return target

    def _gc(self, keep: Path):
        if self.keep_last is None or jax.process_index() != 0:
            return
        cks = [p for *_, p in self.list_checkpoints() if p != keep]
        for p in cks[: max(0, len(cks) - (self.keep_last - 1))]:
            import shutil

            shutil.rmtree(p, ignore_errors=True)

    def restore(self, state: Any, path: Path | None = None) -> tuple[Any, int]:
        """Restore into ``state`` (an initialized TrainState). Returns
        (new_state, epoch). Missing keys keep init values; perceiver latents
        with a mismatched shape are left at init (reference ``:346-349``)."""
        path = path or self.latest()
        if path is None:
            return state, 0

        savable_params, frozen = split_frozen(state.params)
        # template-free read (host numpy), then lenient merge — shape
        # mismatches keep the init value instead of erroring. Restored host
        # leaves are re-placed onto the TEMPLATE's shardings, so a
        # checkpoint written on mesh A restores cleanly onto mesh B (the
        # values are topology-free; placement follows the live state).
        raw = ocp.PyTreeCheckpointer().restore(Path(path).absolute())
        merged_params = _merge_lenient(savable_params, raw["params"])
        # frozen subtrees restore from the checkpoint when it carries them
        # (imported run dirs, save(include_frozen=True)); training
        # checkpoints don't, and the live init values stand in
        frozen = {
            k: (_merge_lenient(v, raw["params"][k])
                if isinstance(raw["params"], dict) and k in raw["params"]
                else v)
            for k, v in frozen.items()
        }
        merged_params.update(frozen)
        merged_params = _place_like(state.params, merged_params)
        try:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(state.opt_state),
                jax.tree.leaves(raw["opt_state"]),
            )
            opt_state = _place_like(state.opt_state, opt_state)
        except ValueError:
            # optimizer definition changed since the checkpoint (e.g. a
            # pretrain checkpoint consumed by sft_scratch, which re-inits
            # optimizer state anyway) — keep the fresh opt state
            opt_state = state.opt_state
        new_state = dataclasses.replace(
            state,
            params=merged_params,
            opt_state=opt_state,
            step=np.asarray(raw["step"]),  # host value: stays uncommitted
        )
        return new_state, int(raw["epoch"])


def _place_like(template, tree):
    """device_put each restored leaf to its template leaf's sharding (when
    the template is a committed jax.Array of the same shape)."""

    def place(t, x):
        if (
            isinstance(t, jax.Array)
            and hasattr(t, "sharding")
            and not isinstance(t.sharding, jax.sharding.SingleDeviceSharding)
            and hasattr(x, "shape")
            and t.shape == getattr(x, "shape", None)
        ):
            return jax.device_put(x, t.sharding)
        # single-device templates (e.g. optimizer scalars): orbax restores
        # committed-to-device-0 arrays, which clash with mesh-placed
        # neighbors under jit — hand them back as host values so jit stays
        # free to place them
        if isinstance(x, jax.Array):
            return np.asarray(x)
        return x

    return jax.tree.map(place, template, tree)


def _merge_lenient(init: dict, restored: dict) -> dict:
    """Recursively prefer restored leaves whose shape matches init."""

    def merge(a, b):
        if isinstance(a, dict):
            return {
                k: merge(a[k], b[k]) if isinstance(b, dict) and k in b else a[k]
                for k in a
            }
        if b is None:
            return a
        if hasattr(b, "shape") and hasattr(a, "shape") and a.shape != b.shape:
            return a  # shape-mismatch: keep init (latents reinit semantics)
        return b

    return merge(init, restored)
