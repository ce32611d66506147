"""Continuous-batching serving engine.

The reference serves through HF ``generate`` one request at a time
(``local_demo.py``).  Production TPU serving wants the chip busy across
requests, so this engine keeps a fixed pool of KV-cache *slots*:

- queued requests are admitted in BATCHES: one jitted prefill call covers
  up to ``admit_batch`` newcomers (MMA mask, fixed shapes, dummy-padded),
  then one scatter merges all of them into their slots — a bs-4 prefill
  costs ~1.6x a bs-1 prefill, so batched admission is ~2.5x less chip
  time per admitted request than the old admit-one-at-a-time loop, which
  stalled every active slot for a full prefill per newcomer;
- every engine step decodes ALL active slots in one jitted causal step
  (per-slot lengths/positions — the engine contract already supports
  ragged batches);
- decode runs in jitted CHUNKS of ``decode_chunk`` steps (multi-step
  scheduling): one host fetch per chunk instead of per token — through
  the tunneled runtime a per-token sync costs ~20 ms, more than the
  decode step itself (measured 3.1 -> double-digit img/s);
- finished slots (eos / budget) free at chunk boundaries and refill from
  the queue, so short answers hold long ones hostage for at most
  ``decode_chunk - 1`` steps;
- all dispatches are async (JAX): the host never waits on the device, so
  admission dispatch overlaps in-flight decode execution.

All device work is three jitted functions (prefill-batch, insert-many,
decode-chunk); the host loop is bookkeeping only.
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
                 admit_batch: int = 4, decode_chunk: int = 8,
                 policy: Policy = Policy(param_dtype=jnp.bfloat16),
                 sampling: SamplingConfig = SamplingConfig(),
                 kv_int8: bool = False, admit_policy: str = "greedy"):
        if admit_policy not in ("greedy", "batched"):
            raise ValueError(f"admit_policy {admit_policy!r}")
        self.params = params
        self.cfg = cfg
        self.policy = policy
        self.sampling = sampling
        self.num_slots = num_slots
        self.max_len = max_len
        self.prompt_bucket = prompt_bucket
        self.admit_batch = max(1, min(admit_batch, num_slots))
        self.decode_chunk = max(1, decode_chunk)
        # "greedy": admit into every free slot immediately (best TTFT).
        # "batched": under backlog, hold admission until a full
        # ``admit_batch`` of slots is free — a bs-8 prefill is ~2x the MXU
        # efficiency of 4 bs-2 prefills, and decode-step cost is nearly
        # flat in the active-slot count (weight-read bound), so waiting
        # costs little and the drain throughput rises (best img/s).
        self.admit_policy = admit_policy
        # int8 KV halves slot-cache HBM: the memory-capacity option for
        # more slots / longer contexts (slightly slower per step at bs16,
        # see PERF.md)
        self.kv_int8 = kv_int8

        if kv_int8:
            from ..models.phi3 import KVCacheQ

            cache = KVCacheQ.create(cfg.phi3, num_slots, max_len)
        else:
            cache = KVCache.create(cfg.phi3, num_slots, max_len,
                                   dtype=policy.compute_dtype)
        self.state = GenState(
            cache=cache,
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

        self._prefill_batch = jax.jit(self._prefill_batch_impl)
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(1,))

    # -- jitted device functions ---------------------------------------------
    def _prefill_batch_impl(self, params, ids, img, valid):
        return prefill(params, self.cfg, ids, img, valid,
                       max_len=self.max_len, policy=self.policy,
                       kv_int8=self.kv_int8)

    def _insert_impl(self, state: GenState, new: GenState, slots):
        """Scatter all admit_batch rows of ``new`` into their slots; padded
        rows carry slot index == num_slots and drop."""
        from ..models.phi3 import KVCacheQ

        if isinstance(state.cache, KVCacheQ):
            cache = KVCacheQ(
                k=state.cache.k.at[:, slots].set(new.cache.k, mode="drop"),
                ks=state.cache.ks.at[:, slots].set(new.cache.ks, mode="drop"),
                v=state.cache.v.at[:, slots].set(new.cache.v, mode="drop"),
                vs=state.cache.vs.at[:, slots].set(new.cache.vs, mode="drop"),
            )
        else:
            cache = KVCache(
                k=state.cache.k.at[:, slots].set(new.cache.k, mode="drop"),
                v=state.cache.v.at[:, slots].set(new.cache.v, mode="drop"),
            )
        kv_valid = state.kv_valid.at[slots].set(new.kv_valid, mode="drop")
        lengths = state.lengths.at[slots].set(new.lengths, mode="drop")
        last_logits = state.last_logits.at[slots].set(
            new.last_logits, mode="drop"
        )
        return GenState(cache=cache, kv_valid=kv_valid,
                        lengths=lengths, last_logits=last_logits)

    def _decode_impl(self, params, state: GenState, active, key):
        def one(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            tok = sample(st.last_logits, self.sampling, sub)
            tok = jnp.where(
                active, tok, self.cfg.pad_token_id
            ).astype(jnp.int32)
            new_state = decode_step(params, self.cfg, st, tok,
                                    policy=self.policy)
            # Only the BOOKKEEPING freezes for inactive slots (kv_valid /
            # lengths / last_logits). The cache itself may advance freely:
            # a garbage token lands at the frozen lengths[i] position,
            # invisible behind the frozen kv_valid, and admission
            # overwrites the whole row. A cache-sized where-merge would
            # hold 3 cache copies in HBM (OOM at 16 slots x 768 on v5e).
            keep = lambda new, old: jnp.where(
                active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            )
            merged = GenState(
                cache=new_state.cache,
                kv_valid=keep(new_state.kv_valid, st.kv_valid),
                lengths=keep(new_state.lengths, st.lengths),
                last_logits=keep(new_state.last_logits, st.last_logits),
            )
            return (merged, k), tok

        (state, _), toks = jax.lax.scan(
            one, (state, key), None, length=self.decode_chunk
        )
        return state, toks  # toks: (decode_chunk, num_slots)

    # -- host API ---------------------------------------------------------------
    def warmup(self):
        """Compile every device function ahead of serving: the decode chunk
        and one prefill+insert per power-of-two admission size. Through a
        tunneled runtime each compile is tens of seconds — production
        engines pay this at startup, never mid-traffic."""
        t = self.prompt_bucket
        s = self.cfg.siglip.image_size
        b = 1
        while True:
            ids = np.full((b, t), self.cfg.pad_token_id, np.int32)
            valid = np.zeros((b, t), np.int32)
            valid[:, 0] = 1
            imgs = np.zeros((b, s, s, 3), np.float32)
            slot_idx = np.full((b,), self.num_slots, np.int32)  # all drop
            new = self._prefill_batch(
                self.params, jnp.array(ids), jnp.array(imgs), jnp.array(valid)
            )
            self.state = self._insert(self.state, new, jnp.array(slot_idx))
            del new
            # serialize: with async dispatch every warmup size's prefill
            # state would be live at once (HBM OOM at 4B geometry)
            np.asarray(self.state.lengths)
            if b >= self.admit_batch:
                break
            b = min(b * 2, self.admit_batch)
        self._rng, sub = jax.random.split(self._rng)
        self.state, toks = self._decode(
            self.params, self.state,
            jnp.zeros((self.num_slots,), bool), sub,
        )
        np.asarray(toks)

    def submit(self, input_ids: list[int], image: np.ndarray,
               max_new_tokens: int = 128, eos_id: int | None = None) -> Request:
        req = Request(input_ids=list(input_ids), image=image,
                      max_new_tokens=max_new_tokens, eos_id=eos_id)
        self.queue.put(req)
        return req

    def _admit_many(self, slots: list[int], reqs: list[Request]):
        """One batched prefill for up to admit_batch requests, one scatter
        into their slots.

        The prefill batch is RIGHT-SIZED to the smallest power of two
        covering the newcomers (jit retraces once per size): padding every
        admission to ``admit_batch`` makes each 2-slot refill pay a full
        ``admit_batch``-row prefill+vision — measured 7.6 -> 6.0 img/s
        going from admit 4 to 8 under mixed arrivals precisely because the
        padded rows burn real compute on zeros."""
        b = 1
        while b < len(reqs):
            b *= 2
        b = min(b, self.admit_batch)
        t = self.prompt_bucket
        s = self.cfg.siglip.image_size
        ids = np.full((b, t), self.cfg.pad_token_id, np.int32)
        valid = np.zeros((b, t), np.int32)
        imgs = np.zeros((b, s, s, 3), np.float32)
        slot_idx = np.full((b,), self.num_slots, np.int32)  # OOB -> drop
        for r, (slot, req) in enumerate(zip(slots, reqs)):
            n = min(len(req.input_ids), t)
            ids[r, :n] = req.input_ids[:n]
            valid[r, :n] = 1
            imgs[r] = req.image
            slot_idx[r] = slot
        # dummy rows still need one valid token (prefill assumes non-empty)
        for r in range(len(reqs), b):
            valid[r, 0] = 1
        new = self._prefill_batch(
            self.params, jnp.array(ids), jnp.array(imgs), jnp.array(valid)
        )
        self.state = self._insert(self.state, new, jnp.array(slot_idx))
        for slot, req in zip(slots, reqs):
            self.slot_req[slot] = req
            self.slot_tokens[slot] = []

    def step(self) -> int:
        """Admit queued requests into free slots (batched), run one decode
        step. Returns the number of active slots."""
        free = [i for i, r in enumerate(self.slot_req) if r is None]
        n_active = self.num_slots - len(free)
        hold = (
            self.admit_policy == "batched"
            and n_active > 0
            and len(free) < min(self.admit_batch, self.queue.qsize())
        )
        while free and not self.queue.empty() and not hold:
            take_slots, take_reqs = [], []
            while free and len(take_reqs) < self.admit_batch:
                try:
                    req = self.queue.get_nowait()
                except queue.Empty:
                    break
                take_reqs.append(req)
                take_slots.append(free.pop(0))
            if take_reqs:
                self._admit_many(take_slots, take_reqs)

        active_mask = np.array(
            [r is not None for r in self.slot_req], dtype=bool
        )
        if not active_mask.any():
            return 0

        self._rng, sub = jax.random.split(self._rng)
        self.state, toks = self._decode(
            self.params, self.state, jnp.array(active_mask), sub
        )
        toks = np.asarray(toks)  # (decode_chunk, num_slots) — ONE host sync
        for slot in range(self.num_slots):
            req = self.slot_req[slot]
            if req is None:
                continue
            for k in range(toks.shape[0]):
                t = int(toks[k, slot])
                done = (req.eos_id is not None and t == req.eos_id)
                if not done:
                    self.slot_tokens[slot].append(t)
                if done or len(self.slot_tokens[slot]) >= req.max_new_tokens:
                    # tokens past eos/budget within the chunk are garbage
                    # the device kept decoding; drop them
                    req._result.put(self.slot_tokens[slot])
                    self.slot_req[slot] = None
                    break
        return int(active_mask.sum())

    def run_until_drained(self, max_steps: int = 100000):
        steps = 0
        while (not self.queue.empty() or any(
            r is not None for r in self.slot_req
        )) and steps < max_steps:
            self.step()
            steps += 1
        return steps
