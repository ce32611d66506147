"""Export aki_tpu params back to the reference PyTorch checkpoint layout.

Produces a ``model_state_dict`` with the reference key names
(``lang_model.*`` fused qkv/gate_up, ``vision_tokenizer.*`` perceiver,
Decoupled extra tables) so reference users can load our training output
with their ``load_checkpoint`` (``train_utils.py:330-373``) or package it
for ``AKI.from_pretrained``.  Inverse of ``torch_to_jax.py``.
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_phi3(params: dict, prefix: str = "lang_model.") -> dict:
    sd = {}
    sd[prefix + "model.embed_tokens.weight"] = _np(params["embed"]["table"])
    L = params["layers"]["wq"].shape[0]
    for i in range(L):
        p = f"{prefix}model.layers.{i}."
        lay = params["layers"]
        sd[p + "input_layernorm.weight"] = _np(lay["ln1"]["scale"][i])
        qkv = np.concatenate(
            [_np(lay["wq"][i]).T, _np(lay["wk"][i]).T, _np(lay["wv"][i]).T], 0
        )
        sd[p + "self_attn.qkv_proj.weight"] = qkv
        sd[p + "self_attn.o_proj.weight"] = _np(lay["wo"][i]).T
        sd[p + "post_attention_layernorm.weight"] = _np(lay["ln2"]["scale"][i])
        gu = np.concatenate([_np(lay["w_gate"][i]).T, _np(lay["w_up"][i]).T], 0)
        sd[p + "mlp.gate_up_proj.weight"] = gu
        sd[p + "mlp.down_proj.weight"] = _np(lay["w_down"][i]).T
    sd[prefix + "model.norm.weight"] = _np(params["final_norm"]["scale"])
    return sd


def export_perceiver(params: dict, prefix: str = "vision_tokenizer.") -> dict:
    sd = {prefix + "latents": _np(params["latents"])}
    lay = params["layers"]
    L = lay["to_q"].shape[0]
    for i in range(L):
        a = f"{prefix}layers.{i}.0."
        f = f"{prefix}layers.{i}.1."
        sd[a + "norm_media.weight"] = _np(lay["norm_media"]["scale"][i])
        sd[a + "norm_media.bias"] = _np(lay["norm_media"]["bias"][i])
        sd[a + "norm_latents.weight"] = _np(lay["norm_latents"]["scale"][i])
        sd[a + "norm_latents.bias"] = _np(lay["norm_latents"]["bias"][i])
        sd[a + "to_q.weight"] = _np(lay["to_q"][i]).T
        sd[a + "to_kv.weight"] = _np(lay["to_kv"][i]).T
        sd[a + "to_out.weight"] = _np(lay["to_out"][i]).T
        sd[f + "0.weight"] = _np(lay["ff_ln"]["scale"][i])
        sd[f + "0.bias"] = _np(lay["ff_ln"]["bias"][i])
        sd[f + "1.weight"] = _np(lay["ff1"][i]).T
        sd[f + "3.weight"] = _np(lay["ff2"][i]).T
    sd[prefix + "norm.weight"] = _np(params["norm"]["scale"])
    sd[prefix + "norm.bias"] = _np(params["norm"]["bias"])
    sd[prefix + "projection.weight"] = _np(params["proj"]["w"]).T
    sd[prefix + "projection.bias"] = _np(params["proj"]["b"])
    return sd


def export_aki_checkpoint(params: dict) -> dict:
    """Full aki_tpu param tree -> reference model_state_dict (no vision
    encoder, per the reference's checkpoint filter)."""
    sd = {}
    sd.update(export_phi3(params["phi3"]))
    sd.update(export_perceiver(params["perceiver"]))
    sd["lang_model.model.embed_tokens.additional_embedding.weight"] = _np(
        params["extra_embed"]["table"]
    )
    sd["lang_model.lm_head.weight"] = _np(params["lm_head"]["w"]).T
    sd["lang_model.lm_head.additional_fc.weight"] = _np(
        params["extra_head"]["w"]
    ).T
    # DecoupledLinear biases (bias=True in the reference): emit zeros when a
    # scratch tree lacks them so the reference's strict load finds the keys
    if "b" in params["lm_head"]:
        sd["lang_model.lm_head.bias"] = _np(params["lm_head"]["b"])
    else:
        sd["lang_model.lm_head.bias"] = np.zeros(
            sd["lang_model.lm_head.weight"].shape[0], np.float32)
    if "b" in params["extra_head"]:
        sd["lang_model.lm_head.additional_fc.bias"] = _np(params["extra_head"]["b"])
    else:
        sd["lang_model.lm_head.additional_fc.bias"] = np.zeros(
            sd["lang_model.lm_head.additional_fc.weight"].shape[0], np.float32)
    return sd


def save_torch_checkpoint(params: dict, path: str, epoch: int = 0,
                          step: int = 0) -> None:
    import torch

    sd = {k: torch.tensor(v) for k, v in export_aki_checkpoint(params).items()}
    torch.save(
        {"epoch": epoch, "step": step, "model_state_dict": sd}, path
    )
