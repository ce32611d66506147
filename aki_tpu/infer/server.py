"""Continuous-batching serving engine.

The reference serves through HF ``generate`` one request at a time
(``local_demo.py``).  Production TPU serving wants the chip busy across
requests, so this engine keeps a fixed pool of KV-cache *slots*:

- an incoming request is prefilled alone (MMA mask) into a fresh
  single-sequence cache, then spliced into a free slot of the pooled cache
  with one donated dynamic-update-slice;
- every engine step decodes ALL active slots in one jitted causal step
  (per-slot lengths/positions — the engine contract already supports
  ragged batches);
- finished slots (eos / budget) are freed immediately and refilled from
  the queue, so short answers never hold long ones hostage.

All device work is three jitted functions (prefill-one, insert, decode);
the host loop is bookkeeping only.
"""

from __future__ import annotations

import dataclasses
import queue

import numpy as np
import jax
import jax.numpy as jnp

from ..models.common import Policy
from ..models.configs import AKIConfig
from ..models.phi3 import KVCache
from .engine import GenState, decode_step, prefill
from .sampling import SamplingConfig, sample


@dataclasses.dataclass
class Request:
    input_ids: list[int]
    image: np.ndarray              # (H, W, C) preprocessed
    max_new_tokens: int = 128
    eos_id: int | None = None
    _result: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)

    def result(self, timeout=None) -> list[int]:
        return self._result.get(timeout=timeout)


class ServingEngine:
    def __init__(self, params, cfg: AKIConfig, num_slots: int = 8,
                 max_len: int = 1024, prompt_bucket: int = 512,
                 policy: Policy = Policy(param_dtype=jnp.bfloat16),
                 sampling: SamplingConfig = SamplingConfig()):
        self.params = params
        self.cfg = cfg
        self.policy = policy
        self.sampling = sampling
        self.num_slots = num_slots
        self.max_len = max_len
        self.prompt_bucket = prompt_bucket

        self.state = GenState(
            cache=KVCache.create(cfg.phi3, num_slots, max_len,
                                 dtype=policy.compute_dtype),
            kv_valid=jnp.zeros((num_slots, max_len), jnp.int32),
            lengths=jnp.zeros((num_slots,), jnp.int32),
            last_logits=jnp.zeros(
                (num_slots, cfg.output_vocab), jnp.float32
            ),
        )
        # host bookkeeping
        self.slot_req: list[Request | None] = [None] * num_slots
        self.slot_tokens: list[list[int]] = [[] for _ in range(num_slots)]
        self.queue: "queue.Queue[Request]" = queue.Queue()
        self._rng = jax.random.PRNGKey(0)

        self._prefill_one = jax.jit(self._prefill_one_impl)
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(1,))

    # -- jitted device functions ---------------------------------------------
    def _prefill_one_impl(self, params, ids, img, valid):
        return prefill(params, self.cfg, ids, img, valid,
                       max_len=self.max_len, policy=self.policy)

    def _insert_impl(self, state: GenState, one: GenState, slot):
        k = jax.lax.dynamic_update_slice(
            state.cache.k, one.cache.k, (0, slot, 0, 0, 0)
        )
        v = jax.lax.dynamic_update_slice(
            state.cache.v, one.cache.v, (0, slot, 0, 0, 0)
        )
        kv_valid = jax.lax.dynamic_update_slice(
            state.kv_valid, one.kv_valid, (slot, 0)
        )
        lengths = jax.lax.dynamic_update_slice(
            state.lengths, one.lengths, (slot,)
        )
        last_logits = jax.lax.dynamic_update_slice(
            state.last_logits, one.last_logits, (slot, 0)
        )
        return GenState(cache=KVCache(k=k, v=v), kv_valid=kv_valid,
                        lengths=lengths, last_logits=last_logits)

    def _decode_impl(self, params, state: GenState, active, key):
        tok = sample(state.last_logits, self.sampling, key)
        tok = jnp.where(active, tok, self.cfg.pad_token_id).astype(jnp.int32)
        # frozen slots must not advance: decode everything, keep old rows
        new_state = decode_step(params, self.cfg, state, tok,
                                policy=self.policy)
        keep = lambda new, old: jnp.where(
            active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )
        merged = GenState(
            cache=KVCache(
                k=jnp.where(active[None, :, None, None, None],
                            new_state.cache.k, state.cache.k),
                v=jnp.where(active[None, :, None, None, None],
                            new_state.cache.v, state.cache.v),
            ),
            kv_valid=keep(new_state.kv_valid, state.kv_valid),
            lengths=keep(new_state.lengths, state.lengths),
            last_logits=keep(new_state.last_logits, state.last_logits),
        )
        return merged, tok

    # -- host API ---------------------------------------------------------------
    def submit(self, input_ids: list[int], image: np.ndarray,
               max_new_tokens: int = 128, eos_id: int | None = None) -> Request:
        req = Request(input_ids=list(input_ids), image=image,
                      max_new_tokens=max_new_tokens, eos_id=eos_id)
        self.queue.put(req)
        return req

    def _admit(self, slot: int, req: Request):
        t = self.prompt_bucket
        ids = np.full((1, t), self.cfg.pad_token_id, np.int32)
        valid = np.zeros((1, t), np.int32)
        n = min(len(req.input_ids), t)
        ids[0, :n] = req.input_ids[:n]
        valid[0, :n] = 1
        one = self._prefill_one(
            self.params, jnp.array(ids), jnp.array(req.image[None]),
            jnp.array(valid),
        )
        self.state = self._insert(self.state, one, jnp.asarray(slot, jnp.int32))
        self.slot_req[slot] = req
        self.slot_tokens[slot] = []

    def step(self) -> int:
        """Admit queued requests into free slots, run one decode step.
        Returns the number of active slots."""
        for slot in range(self.num_slots):
            if self.slot_req[slot] is None:
                try:
                    req = self.queue.get_nowait()
                except queue.Empty:
                    break
                self._admit(slot, req)

        active_mask = np.array(
            [r is not None for r in self.slot_req], dtype=bool
        )
        if not active_mask.any():
            return 0

        self._rng, sub = jax.random.split(self._rng)
        self.state, tok = self._decode(
            self.params, self.state, jnp.array(active_mask), sub
        )
        tok = np.asarray(tok)
        for slot in range(self.num_slots):
            req = self.slot_req[slot]
            if req is None:
                continue
            t = int(tok[slot])
            done = (req.eos_id is not None and t == req.eos_id)
            if not done:
                self.slot_tokens[slot].append(t)
            if done or len(self.slot_tokens[slot]) >= req.max_new_tokens:
                req._result.put(self.slot_tokens[slot])
                self.slot_req[slot] = None
        return int(active_mask.sum())

    def run_until_drained(self, max_steps: int = 100000):
        steps = 0
        while (not self.queue.empty() or any(
            r is not None for r in self.slot_req
        )) and steps < max_steps:
            self.step()
            steps += 1
        return steps
