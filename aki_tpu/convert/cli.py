"""Checkpoint import CLI: reference PyTorch weights -> aki_tpu run dir.

Assembles a full aki_tpu parameter tree from the three weight sources a
reference user has, then writes an orbax checkpoint our CheckpointManager
and eval/demo CLIs consume:

- ``--torch-checkpoint``: an AKI training checkpoint
  (``checkpoint_{epoch}.pt`` with ``model_state_dict``; the vision encoder
  is absent by the reference's own filter, ``train_utils.py:376-410``);
- ``--siglip``: a local HF SiglipVisionModel directory (safetensors or
  pytorch_model.bin) for the frozen encoder;
- ``--phi3``: optional local HF Phi3 directory — used when the torch
  checkpoint lacks the language backbone, and as the source of LongRoPE
  factors from its config.json.

Usage:
    python -m aki_tpu.convert.cli --torch-checkpoint ckpt.pt \
        --siglip /models/siglip-so400m --out runs/imported
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..models.configs import AKIConfig, aki_4b
from .torch_to_jax import convert_aki_checkpoint, convert_siglip


def load_torch_state_dict(path: str) -> dict:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob)
    return {k: v for k, v in sd.items()}, blob


def load_hf_dir_state_dict(path: str) -> dict:
    """Read all tensors from a local HF model dir (safetensors preferred)."""
    p = Path(path)
    sd = {}
    st_files = sorted(p.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sd.update(load_file(str(f)))
        return sd
    bins = sorted(p.glob("pytorch_model*.bin"))
    if bins:
        import torch

        for f in bins:
            sd.update(torch.load(str(f), map_location="cpu"))
        return sd
    raise FileNotFoundError(f"no safetensors / bin files under {path}")


def rope_factors_from_config(path: str) -> dict:
    cfg = json.loads((Path(path) / "config.json").read_text())
    rs = cfg.get("rope_scaling") or {}
    out = {}
    if rs.get("type") == "longrope" or rs.get("rope_type") == "longrope":
        out["rope_short_factor"] = tuple(rs["short_factor"])
        out["rope_long_factor"] = tuple(rs["long_factor"])
    return out


def import_checkpoint(
    torch_checkpoint: str,
    out_dir: str,
    siglip: str | None = None,
    phi3: str | None = None,
    cfg: AKIConfig | None = None,
) -> dict:
    import dataclasses

    cfg = cfg or aki_4b()
    if phi3:
        factors = rope_factors_from_config(phi3)
        for key, val in factors.items():
            baked = getattr(cfg.phi3, key)
            if baked is not None and tuple(baked) != tuple(val):
                print(f"WARNING: {key} from {phi3}/config.json differs from "
                      "the baked-in Phi-3.5 factors; using the checkpoint's "
                      "(authoritative) values")
        cfg = dataclasses.replace(
            cfg, phi3=dataclasses.replace(cfg.phi3, **factors)
        )

    sd, blob = load_torch_state_dict(torch_checkpoint)
    if not any(k.startswith(("lang_model.", "module.lang_model.")) for k in sd):
        raise ValueError(
            "checkpoint lacks lang_model.* keys — the reference always saves "
            "the (trainable) language backbone (train_utils.py:376-410)"
        )
    params = convert_aki_checkpoint(sd, cfg)

    if "siglip" not in params:
        if not siglip:
            raise ValueError(
                "checkpoint has no vision encoder (the reference drops it); "
                "pass --siglip with a local SigLIP model dir"
            )
        hf_sd = load_hf_dir_state_dict(siglip)
        params["siglip"] = convert_siglip(hf_sd, cfg.siglip)

    # write via the CheckpointManager layout so train/eval/demo resume it
    import jax.numpy as jnp
    import optax

    from ..train.checkpoints import CheckpointManager
    from ..train.step import TrainState

    params = {k: _to_jnp(v) for k, v in params.items()}
    opt = optax.sgd(0.0)
    state = TrainState.create(params, opt)
    state = dataclasses.replace(
        state, step=jnp.asarray(int(blob.get("step", 0)), jnp.int32)
    )
    mgr = CheckpointManager(out_dir)
    # include_frozen: an imported run dir is the distribution artifact —
    # without the SigLIP tower, every downstream restore (eval/demo
    # load_params, AKIModel.from_pretrained) would silently serve a
    # RANDOM vision encoder (the training-checkpoint frozen-subtree drop
    # is reference parity, but it only works because a training run
    # restores the tower from its own conversion-time init)
    path = mgr.save(state, epoch=int(blob.get("epoch", 0)),
                    step=int(blob.get("step", 0)), include_frozen=True)
    print(f"imported -> {path}")
    return params


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(np.asarray(tree))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--siglip", default=None)
    ap.add_argument("--phi3", default=None)
    args = ap.parse_args(argv)
    import_checkpoint(args.torch_checkpoint, args.out,
                      siglip=args.siglip, phi3=args.phi3)


if __name__ == "__main__":
    main()
