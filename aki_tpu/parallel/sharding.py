"""Parameter partitioning rules: param-path regex -> PartitionSpec.

The reference wraps per-decoder-block modules in FSDP units
(``src/vlm.py:666-688``); here sharding is declared once per weight family
and GSPMD materializes the all-gathers/reduce-scatters.  Conventions:

- matmul *input* dims shard over ``fsdp`` (ZeRO-3 weight sharding);
- matmul *output* dims that correspond to heads / MLP-inner shard over
  ``tensor`` (megatron split: wq/wk/wv/w_gate/w_up column-parallel, wo /
  w_down row-parallel);
- vocab dims shard over ``tensor`` for the head, ``fsdp`` for the table;
- norms/scales/biases replicate.

Rules are matched on the "/"-joined param path, first match wins.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex, spec). Layer-stacked params have a leading L dim => leading None.
PARAM_RULES: list[tuple[str, P]] = [
    # --- Phi-3 decoder ----------------------------------------------------
    (r"phi3/embed/table", P("tensor", "fsdp")),
    (r"phi3/layers/ln\d", P(None, None)),
    (r"phi3/layers/w[qkv]$", P(None, "fsdp", "tensor")),
    (r"phi3/layers/wo$", P(None, "tensor", "fsdp")),
    (r"phi3/layers/w_(gate|up)$", P(None, "fsdp", "tensor")),
    (r"phi3/layers/w_down$", P(None, "tensor", "fsdp")),
    # MoE decoder option: experts shard over the "expert" axis
    (r"phi3/layers/moe/router/w", P(None)),
    (r"phi3/layers/moe/w_(gate|up)$", P(None, "expert", "fsdp", "tensor")),
    (r"phi3/layers/moe/w_down$", P(None, "expert", "tensor", "fsdp")),
    (r"phi3/final_norm", P(None)),
    # --- decoupled vocab ---------------------------------------------------
    (r"extra_embed/table", P(None, "fsdp")),
    (r"lm_head/w", P("fsdp", "tensor")),
    (r"extra_head/w", P("fsdp", None)),
    # --- SigLIP (frozen; sharded to save HBM) ------------------------------
    (r"siglip/patch_embed/w", P("fsdp", "tensor")),
    (r"siglip/pos_embed", P(None, "fsdp")),
    (r"siglip/layers/w[qkv]$", P(None, "fsdp", "tensor")),
    (r"siglip/layers/wo$", P(None, "tensor", "fsdp")),
    (r"siglip/layers/fc1/w", P(None, "fsdp", "tensor")),
    (r"siglip/layers/fc2/w", P(None, "tensor", "fsdp")),
    (r"siglip/layers/fc\d/b", P(None, None)),
    (r"siglip", P()),  # norms, small biases
    # --- perceiver ----------------------------------------------------------
    (r"perceiver/latents", P(None, "fsdp")),
    (r"perceiver/layers/to_q$", P(None, "fsdp", "tensor")),
    (r"perceiver/layers/to_kv$", P(None, "fsdp", "tensor")),
    (r"perceiver/layers/to_out$", P(None, "tensor", "fsdp")),
    (r"perceiver/layers/ff1$", P(None, "fsdp", "tensor")),
    (r"perceiver/layers/ff2$", P(None, "tensor", "fsdp")),
    (r"perceiver/proj/w", P("fsdp", "tensor")),
    (r"perceiver", P()),
    # --- default: replicate -------------------------------------------------
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str, rules=None) -> P:
    for pat, spec in rules or PARAM_RULES:
        if re.search(pat, path_str):
            return spec
    return P()


def _fit_spec(spec: P, ndim: int, mesh: Mesh, shape) -> P:
    """Drop trailing axes of the spec beyond ndim; drop mesh axes whose size
    does not divide the dim (falls back to replication for that dim)."""
    parts = list(spec) + [None] * (ndim - len(spec))
    parts = parts[:ndim]
    fixed = []
    for dim, part in zip(shape, parts):
        if part is None:
            fixed.append(None)
            continue
        names = part if isinstance(part, tuple) else (part,)
        size = 1
        for n in names:
            size *= mesh.shape[n]
        fixed.append(part if dim % size == 0 else None)
    while fixed and fixed[-1] is None:
        fixed.pop()
    return P(*fixed)


def param_shardings(params: Any, mesh: Mesh, rules=None,
                    memory_kind: str | None = None):
    """NamedSharding tree matching ``params``' structure.

    Works on any tree whose leaf paths *end with* a param path — optimizer
    state (``.../mu/phi3/layers/wq``) matches the same rules because
    :func:`spec_for_path` searches, so ZeRO-2 can shard Adam moments with
    the full-shard rules while params use the stripped ones.
    """

    def one(path, leaf):
        spec = spec_for_path(_path_str(path), rules)
        spec = _fit_spec(spec, leaf.ndim, mesh, leaf.shape)
        if memory_kind is None:
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, spec, memory_kind=memory_kind)

    return jax.tree_util.tree_map_with_path(one, params)


def strip_axis_rules(axis: str = "fsdp", rules=None) -> list[tuple[str, P]]:
    """Rules with ``axis`` removed from every spec (that dim replicates).

    ZeRO-2 (reference ``SHARD_GRAD_OP``, ``train/distributed.py:198-199``):
    params replicate over ``fsdp`` while gradients and optimizer state stay
    fsdp-sharded — apply these rules to params, the originals to opt state.
    """

    def strip(spec: P) -> P:
        parts = []
        for part in spec:
            if part == axis:
                parts.append(None)
            elif isinstance(part, tuple):
                kept = tuple(a for a in part if a != axis)
                parts.append(kept if kept else None)
            else:
                parts.append(part)
        while parts and parts[-1] is None:
            parts.pop()
        return P(*parts)

    return [(pat, strip(spec)) for pat, spec in (rules or PARAM_RULES)]


def shard_params(params: Any, mesh: Mesh, rules=None):
    """Place a param tree onto the mesh per the rules."""
    return jax.device_put(params, param_shardings(params, mesh, rules))
