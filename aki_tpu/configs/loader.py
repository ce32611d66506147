"""Unified YAML config system (replaces the reference's argparse+Hydra split).

Features (the subset of Hydra the reference actually uses,
``configs/sft.yaml`` + ``train/instruction_finetune.py:59-66``):

- a ``defaults`` list of config fragments merged in order
  (``sft_datasets/*.yaml`` -> ``datasets:`` entries);
- ``${key.path}`` interpolation (e.g. ``${root}``);
- dotted-path CLI overrides ``a.b=c``;
- plain dataclass-style access via :class:`Config` (attribute + mapping).

The pretrain CLI's dynamically generated per-dataset flags
(``train/train.py:100-116``) become per-dataset config blocks.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import yaml

_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


class Config(dict):
    """dict with attribute access, recursive."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def get_path(self, dotted: str, default=None):
        cur: Any = self
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur


def _merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def _interpolate(node: Any, root: dict) -> Any:
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if isinstance(node, str):
        def sub(m):
            cur: Any = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return str(cur)

        # full-value reference keeps the referenced type
        m = _INTERP.fullmatch(node)
        if m:
            cur: Any = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return cur
        return _INTERP.sub(sub, node)
    return node


def _parse_value(s: str) -> Any:
    return yaml.safe_load(s)


def load_config(path: str | Path, overrides: list[str] | None = None) -> Config:
    path = Path(path)
    raw = yaml.safe_load(path.read_text()) or {}

    merged: dict = {}
    for entry in raw.pop("defaults", []):
        if entry == "_self_":
            merged = _merge(merged, raw)
            raw = {}
            continue
        if isinstance(entry, dict):
            # {group: name} loads <group>/<name>.yaml; fragments are
            # self-describing (they set their own top-level keys)
            [(group, name)] = entry.items()
            frag_path = path.parent / group / f"{name}.yaml"
            frag = yaml.safe_load(frag_path.read_text()) or {}
            merged = _merge(merged, frag)
        else:
            frag = yaml.safe_load((path.parent / f"{entry}.yaml").read_text()) or {}
            merged = _merge(merged, frag)
    merged = _merge(merged, raw)

    for ov in overrides or []:
        key, _, val = ov.partition("=")
        cur = merged
        parts = key.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = _parse_value(val)

    merged = _interpolate(merged, merged)
    return Config(merged)
