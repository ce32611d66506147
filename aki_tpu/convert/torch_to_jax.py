"""Convert reference (PyTorch) checkpoints to aki_tpu param trees.

Handles the three weight sources a reference user has:

- HF ``Phi3ForCausalLM`` state dicts (backbone, fused qkv/gate_up split
  here into our TP-friendly separate kernels);
- HF ``SiglipVisionModel`` state dicts (conv patch embed refolded into our
  patchify matmul);
- AKI training checkpoints (``checkpoint_{epoch}.pt`` model_state_dict with
  ``vision_tokenizer.*`` perceiver keys and Decoupled extra tables,
  reference ``train/train_utils.py:376-410``).

All kernels become (in, out); torch ``nn.Linear`` stores (out, in).
Numpy-only (no torch import needed when fed numpy arrays); tensors are
accepted via ``.detach().cpu().numpy()`` duck-typing.
"""

from __future__ import annotations

import numpy as np

from ..models.configs import AKIConfig, Phi3Config, SigLIPVisionConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _t(x) -> np.ndarray:
    return _np(x).T.copy()


def convert_phi3(sd: dict, cfg: Phi3Config, prefix: str = "") -> dict:
    """HF Phi3ForCausalLM state_dict -> our stacked-layer params.

    qkv_proj rows are [q (nh*dh), k (nkv*dh), v (nkv*dh)]; gate_up_proj rows
    are [gate (inter), up (inter)].
    """
    g = lambda k: sd[prefix + k]
    nh, nkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inter, L = cfg.intermediate_size, cfg.num_layers

    ln1, wq, wk, wv, wo, ln2, w_gate, w_up, w_down = ([] for _ in range(9))
    for i in range(L):
        p = f"model.layers.{i}."
        ln1.append(_np(g(p + "input_layernorm.weight")))
        qkv = _np(g(p + "self_attn.qkv_proj.weight"))  # (q+k+v, d)
        q_end, k_end = nh * dh, nh * dh + nkv * dh
        wq.append(qkv[:q_end].T.copy())
        wk.append(qkv[q_end:k_end].T.copy())
        wv.append(qkv[k_end:].T.copy())
        wo.append(_t(g(p + "self_attn.o_proj.weight")))
        ln2.append(_np(g(p + "post_attention_layernorm.weight")))
        gu = _np(g(p + "mlp.gate_up_proj.weight"))  # (2*inter, d)
        w_gate.append(gu[:inter].T.copy())
        w_up.append(gu[inter:].T.copy())
        w_down.append(_t(g(p + "mlp.down_proj.weight")))

    stack = lambda xs: np.stack(xs, 0)
    return {
        "embed": {"table": _np(g("model.embed_tokens.weight"))},
        "layers": {
            "ln1": {"scale": stack(ln1)},
            "wq": stack(wq), "wk": stack(wk), "wv": stack(wv), "wo": stack(wo),
            "ln2": {"scale": stack(ln2)},
            "w_gate": stack(w_gate), "w_up": stack(w_up), "w_down": stack(w_down),
        },
        "final_norm": {"scale": _np(g("model.norm.weight"))},
    }


def convert_phi3_lm_head(sd: dict, prefix: str = "") -> np.ndarray:
    return _t(sd[prefix + "lm_head.weight"])


def convert_siglip(sd: dict, cfg: SigLIPVisionConfig, prefix: str = "") -> dict:
    """HF SiglipVisionModel state_dict -> our params.

    The conv kernel (out, c, kh, kw) is refolded to our patchify order
    (kh, kw, c) -> (kh*kw*c, out).
    """
    g = lambda k: sd[prefix + k]
    L = cfg.num_layers

    conv = _np(g("vision_model.embeddings.patch_embedding.weight"))
    conv = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.hidden_size).copy()

    def ln(prefix_ln, idx=None):
        w = _np(g(prefix_ln + ".weight"))
        b = _np(g(prefix_ln + ".bias"))
        return w, b

    layers: dict[str, list] = {k: [] for k in (
        "ln1w", "ln1b", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
        "ln2w", "ln2b", "f1w", "f1b", "f2w", "f2b",
    )}
    for i in range(L):
        p = f"vision_model.encoder.layers.{i}."
        w, b = ln(p + "layer_norm1")
        layers["ln1w"].append(w); layers["ln1b"].append(b)
        for name, dst_w, dst_b in (
            ("q_proj", "wq", "bq"), ("k_proj", "wk", "bk"),
            ("v_proj", "wv", "bv"), ("out_proj", "wo", "bo"),
        ):
            layers[dst_w].append(_t(g(p + f"self_attn.{name}.weight")))
            layers[dst_b].append(_np(g(p + f"self_attn.{name}.bias")))
        w, b = ln(p + "layer_norm2")
        layers["ln2w"].append(w); layers["ln2b"].append(b)
        layers["f1w"].append(_t(g(p + "mlp.fc1.weight")))
        layers["f1b"].append(_np(g(p + "mlp.fc1.bias")))
        layers["f2w"].append(_t(g(p + "mlp.fc2.weight")))
        layers["f2b"].append(_np(g(p + "mlp.fc2.bias")))

    s = lambda k: np.stack(layers[k], 0)
    post_w, post_b = (
        _np(g("vision_model.post_layernorm.weight")),
        _np(g("vision_model.post_layernorm.bias")),
    )
    return {
        "patch_embed": {
            "w": conv,
            "b": _np(g("vision_model.embeddings.patch_embedding.bias")),
        },
        "pos_embed": _np(g("vision_model.embeddings.position_embedding.weight")),
        "layers": {
            "ln1": {"scale": s("ln1w"), "bias": s("ln1b")},
            "wq": s("wq"), "bq": s("bq"), "wk": s("wk"), "bk": s("bk"),
            "wv": s("wv"), "bv": s("bv"), "wo": s("wo"), "bo": s("bo"),
            "ln2": {"scale": s("ln2w"), "bias": s("ln2b")},
            "fc1": {"w": s("f1w"), "b": s("f1b")},
            "fc2": {"w": s("f2w"), "b": s("f2b")},
        },
        "post_ln": {"scale": post_w, "bias": post_b},
    }


def convert_perceiver(sd: dict, depth: int, prefix: str = "vision_tokenizer.") -> dict:
    """Reference AKI checkpoint perceiver keys -> our params.

    Reference module layout (``src/helpers.py:105-199``): ``latents``,
    ``layers.{i}.0`` = PerceiverAttention (norm_media, norm_latents, to_q,
    to_kv, to_out), ``layers.{i}.1`` = FF Sequential(LayerNorm, Linear,
    GELU, Linear), then ``norm`` + ``projection``.
    """
    g = lambda k: sd[prefix + k]
    layers: dict[str, list] = {k: [] for k in (
        "nmw", "nmb", "nlw", "nlb", "to_q", "to_kv", "to_out",
        "ffnw", "ffnb", "ff1", "ff2",
    )}
    for i in range(depth):
        a = f"layers.{i}.0."
        f = f"layers.{i}.1."
        layers["nmw"].append(_np(g(a + "norm_media.weight")))
        layers["nmb"].append(_np(g(a + "norm_media.bias")))
        layers["nlw"].append(_np(g(a + "norm_latents.weight")))
        layers["nlb"].append(_np(g(a + "norm_latents.bias")))
        layers["to_q"].append(_t(g(a + "to_q.weight")))
        layers["to_kv"].append(_t(g(a + "to_kv.weight")))
        layers["to_out"].append(_t(g(a + "to_out.weight")))
        layers["ffnw"].append(_np(g(f + "0.weight")))
        layers["ffnb"].append(_np(g(f + "0.bias")))
        layers["ff1"].append(_t(g(f + "1.weight")))
        layers["ff2"].append(_t(g(f + "3.weight")))

    s = lambda k: np.stack(layers[k], 0)
    return {
        "latents": _np(g("latents")),
        "layers": {
            "norm_media": {"scale": s("nmw"), "bias": s("nmb")},
            "norm_latents": {"scale": s("nlw"), "bias": s("nlb")},
            "to_q": s("to_q"), "to_kv": s("to_kv"), "to_out": s("to_out"),
            "ff_ln": {"scale": s("ffnw"), "bias": s("ffnb")},
            "ff1": s("ff1"), "ff2": s("ff2"),
        },
        "norm": {"scale": _np(g("norm.weight")), "bias": _np(g("norm.bias"))},
        "proj": {
            "w": _t(g("projection.weight")),
            "b": _np(g("projection.bias")),
        },
    }


def convert_aki_checkpoint(model_sd: dict, cfg: AKIConfig) -> dict:
    """Full reference AKI training checkpoint -> aki_tpu params.

    Expects reference key layout: ``lang_model.*`` (Phi-3 with Decoupled
    embed/head), ``vision_tokenizer.*`` (perceiver), and — if present —
    ``vision_encoder.*`` (usually dropped from checkpoints,
    ``train_utils.py:376-410``; load SigLIP separately then).
    """
    sd = {k.removeprefix("module."): v for k, v in model_sd.items()}
    params: dict = {}

    params["phi3"] = convert_phi3(sd, cfg.phi3, prefix="lang_model.")
    # Decoupled embedding: the base table may appear under the decoupled
    # module's ``.weight`` (same tensor as the original embed table).
    base_key = "lang_model.model.embed_tokens.weight"
    if base_key in sd:
        params["phi3"]["embed"]["table"] = _np(sd[base_key])
    params["extra_embed"] = {
        "table": _np(sd["lang_model.model.embed_tokens.additional_embedding.weight"])
    }
    params["lm_head"] = {"w": convert_phi3_lm_head(sd, prefix="lang_model.")}
    params["extra_head"] = {
        "w": _t(sd["lang_model.lm_head.additional_fc.weight"])
    }
    # DecoupledLinear is built with bias=True (helpers.py:494-586): the base
    # head gains a bias (frozen at its nn.Linear init but part of the
    # checkpoint numerics) and the extra head's bias is trained. Both must
    # be carried or converted logits drift from the reference.
    if "lang_model.lm_head.bias" in sd:
        params["lm_head"]["b"] = _np(sd["lang_model.lm_head.bias"])
    if "lang_model.lm_head.additional_fc.bias" in sd:
        params["extra_head"]["b"] = _np(sd["lang_model.lm_head.additional_fc.bias"])
    params["perceiver"] = convert_perceiver(sd, cfg.perceiver.depth)
    if any(k.startswith("vision_encoder.") for k in sd):
        # factory.py:74-77 stores the *unwrapped* SiglipVisionTransformer
        # (model.vision_model), so checkpoint keys read
        # ``vision_encoder.embeddings.*`` with no ``vision_model.`` infix.
        vsd = {
            "vision_model." + k.removeprefix("vision_encoder."): v
            for k, v in sd.items() if k.startswith("vision_encoder.")
        }
        params["siglip"] = convert_siglip(vsd, cfg.siglip)
    return params
