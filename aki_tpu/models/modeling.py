"""High-level model API — the ``modeling_aki.AKI`` analogue.

The reference's inference class loads backbones itself and mixes in
``PyTorchModelHubMixin`` for ``AKI.from_pretrained`` (``modeling_aki.py``).
Offline TPU equivalent: :class:`AKIModel` bundles params + config +
tokenizer behind ``from_pretrained(run_dir)`` (a CheckpointManager run dir,
e.g. the output of ``convert/cli.py``) and exposes ``forward`` /
``generate`` / ``answer`` — the surface external eval harnesses
(VLMEvalKit-style) integrate against.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..data.images import decode_image, preprocess
from ..data.tokenizer import load_tokenizer
from .aki import aki_forward, init_aki
from .common import Policy
from .configs import AKIConfig, aki_4b, aki_tiny, config_for_tokenizer


@dataclasses.dataclass
class AKIModel:
    params: dict
    cfg: AKIConfig
    tokenizer: object
    policy: Policy = Policy(param_dtype=jnp.bfloat16)
    max_len: int = 1024

    @classmethod
    def from_pretrained(cls, run_dir: str | None = None,
                        tokenizer_path: str | None = None,
                        tiny: bool = False, seed: int = 0) -> "AKIModel":
        tokenizer = load_tokenizer(tokenizer_path)
        base = aki_tiny(tokenizer.info.vocab_size) if tiny else aki_4b()
        cfg = config_for_tokenizer(base, tokenizer.info)
        params = init_aki(jax.random.PRNGKey(seed), cfg, dtype=jnp.bfloat16)
        if run_dir:
            import optax

            from ..train.checkpoints import CheckpointManager
            from ..train.step import TrainState

            state = TrainState.create(params, optax.sgd(0.0))
            state, _ = CheckpointManager(run_dir).restore(state)
            params = state.params
        return cls(params=params, cfg=cfg, tokenizer=tokenizer)

    # -- core API ------------------------------------------------------------
    def forward(self, input_ids, images, attn_valid=None, labels=None):
        input_ids = jnp.asarray(input_ids, jnp.int32)
        if attn_valid is None:
            attn_valid = jnp.ones_like(input_ids)
        return aki_forward(
            self.params, self.cfg, input_ids, jnp.asarray(images),
            jnp.asarray(attn_valid),
            labels=None if labels is None else jnp.asarray(labels),
            policy=self.policy,
        )

    def generate(self, input_ids, images, attn_valid=None,
                 max_new_tokens: int = 256, **kw):
        from ..infer.engine import generate

        input_ids = jnp.asarray(input_ids, jnp.int32)
        if attn_valid is None:
            attn_valid = jnp.ones_like(input_ids)
        return generate(
            self.params, self.cfg, input_ids, jnp.asarray(images),
            jnp.asarray(attn_valid), max_new_tokens=max_new_tokens,
            max_len=self.max_len, policy=self.policy, **kw,
        )

    # -- convenience (chat) ----------------------------------------------------
    def answer(self, image_bytes: bytes, question: str,
               max_new_tokens: int = 256) -> str:
        from ..data.sft.templates import SYSTEM_MESSAGE

        prompt = (
            f"<s> <|system|>\n{SYSTEM_MESSAGE}<|end|>\n<|user|>\n<image>\n"
            f"{question}<|end|>\n<|assistant|>\n"
        )
        ids = self.tokenizer.encode(prompt)  # reference eval/demo: add_special_tokens=False (eval.py:81)
        img = preprocess(decode_image(image_bytes), self.cfg.siglip.image_size)
        tokens, num = self.generate(
            [ids], img[None], max_new_tokens=max_new_tokens,
            eos_id=self.tokenizer.info.end_id,
        )
        return self.tokenizer.decode(np.asarray(tokens)[0][: int(num[0])])
