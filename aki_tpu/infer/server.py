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
import threading

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
    # device copy, uploaded asynchronously at submit() so the H2D transfer
    # overlaps in-flight compute instead of stalling admission
    _image_dev: object = None
    # tokens live on the REQUEST (not the slot): a slot can be reassigned
    # while this request's final chunk is still in flight
    _tokens: list = dataclasses.field(default_factory=list)
    _dispatched: int = 0           # decode steps dispatched so far

    def result(self, timeout=None) -> list[int]:
        return self._result.get(timeout=timeout)


class ServingEngine:
    def __init__(self, params, cfg: AKIConfig, num_slots: int = 8,
                 max_len: int = 1024, prompt_bucket: int = 512,
                 admit_batch: int = 4, decode_chunk: int = 8,
                 policy: Policy = Policy(param_dtype=jnp.bfloat16),
                 sampling: SamplingConfig = SamplingConfig(),
                 kv_int8: bool = False, admit_policy: str = "greedy",
                 prompt_buckets: tuple[int, ...] | None = None,
                 image_uint8: bool = False, tp_mesh=None,
                 compact_tail: bool = False, attn_mode: str | None = None,
                 align_completions: bool = True,
                 upload_chunk: int | None = None,
                 upload_threads: int = 2,
                 upload_ramp: bool = True):
        if admit_policy not in ("greedy", "batched"):
            raise ValueError(f"admit_policy {admit_policy!r}")
        # Tensor-parallel serving over a device mesh: params shard per the
        # megatron rules (parallel/sharding.py), the slot KV cache shards
        # over heads on the ``tensor`` axis, prefill runs the head-sharded
        # flash kernel (shard_map) and decode partitions by GSPMD
        # propagation from the cache/param shardings — no NCCL analogue,
        # collectives ride ICI (SURVEY §2.6 TPU mapping). The host loop is
        # unchanged: slots, admission, and chunked decode are
        # placement-agnostic bookkeeping.
        self.tp_mesh = tp_mesh
        self._rep = None
        if tp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.sharding import shard_params

            if "tensor" not in tp_mesh.axis_names:
                raise ValueError(
                    f"tp_mesh needs a 'tensor' axis, got {tp_mesh.axis_names}"
                )
            # replicated placement for host-fed arrays (committed
            # single-device inputs cannot mix with mesh-sharded params
            # under one jit)
            self._rep = NamedSharding(tp_mesh, PartitionSpec())
            params = shard_params(params, tp_mesh)
        self.params = params
        self.cfg = cfg
        self.policy = policy
        self.sampling = sampling
        self.num_slots = num_slots
        self.max_len = max_len
        self.prompt_bucket = prompt_bucket
        self.admit_batch = max(1, min(admit_batch, num_slots))
        self.decode_chunk = max(1, decode_chunk)
        # Prompt-length buckets (ascending): an admission runs its prefill
        # at the smallest bucket covering the batch's longest prompt — a
        # 256-token prefill is ~60% the chip time of the 512 one, and real
        # traffic skews short. Default: the single ``prompt_bucket``.
        self.prompt_buckets = tuple(sorted(
            prompt_buckets or (prompt_bucket,)
        ))
        if self.prompt_buckets[-1] != prompt_bucket:
            raise ValueError("largest prompt_buckets entry must equal "
                             f"prompt_bucket ({prompt_bucket})")
        # "greedy": admit into every free slot immediately (best TTFT).
        # "batched": under backlog, hold admission until a full
        # ``admit_batch`` of slots is free — a bs-8 prefill is ~2x the MXU
        # efficiency of 4 bs-2 prefills, and decode-step cost is nearly
        # flat in the active-slot count (weight-read bound), so waiting
        # costs little and the drain throughput rises (best img/s).
        self.admit_policy = admit_policy
        # Completion-aligned admission: pick cohorts by chunks-to-
        # completion (ceil(max_new_tokens / decode_chunk)) so a batch's
        # slots free TOGETHER. Decode reads the full live-width cache
        # every step no matter how many slots are still active; admitting
        # mixed-budget cohorts was measured as mean occupancy 30/48 on a
        # 96-request drain — ~35% of decode bandwidth spent re-reading
        # finished slots' KV. eos early-exit still completes sooner; the
        # budget is an upper bound the scheduler is allowed to use.
        self.align_completions = align_completions
        # Uploader transfer granularity. One admission's rows per transfer
        # (the default) measured BEST: bigger chunks amortize the ~0.5 s
        # per-transfer tunnel setup but serialize the ramp — a 48-row
        # first transfer leaves the chip idle where three pipelined 16-row
        # transfers overlap cohort 1's prefill+decode with cohort 2's
        # upload (measured 18.4 -> 15.8 img/s median at upload_chunk=48).
        self.upload_chunk = (admit_batch if upload_chunk is None
                             else max(1, upload_chunk))
        # Concurrent uploader threads: device_put transfers through the
        # tunneled runtime OVERLAP partially — two threads' 16-row chunks
        # measured 774 -> 594 ms/chunk (the ~0.5 s per-transfer setup
        # pipelines against the other thread's payload; a third thread
        # adds nothing, the payload bytes serialize). The uploader wall is
        # near the drain's critical path (~4.6 s of 5.2 s at 96 requests),
        # so this buys ~1 s of ramp. exp/upload_overlap.py is the probe.
        self.upload_threads = max(1, upload_threads)
        # Ramp chunking: the chip idles until the FIRST upload lands (an
        # admission needs admit_batch device-resident rows), so the first
        # pop per uploader thread of each burst moves a HALF chunk —
        # 2 threads x 8 rows seed the first bs16 admission ~0.3 s sooner
        # than one 16-row transfer, then full chunks amortize the setup.
        self.upload_ramp = upload_ramp
        self._ramp_pops = self.upload_threads if upload_ramp else 0
        # int8 KV halves slot-cache HBM: the memory-capacity option for
        # more slots / longer contexts (slightly slower per step at bs16,
        # see PERF.md)
        self.kv_int8 = kv_int8
        # uint8 ingress: clients submit resized RGB uint8 pixels and the
        # jitted prefill normalizes on device ((x/255 - .5)/.5, matching
        # data/images.py:30-31). 4x fewer host->device bytes than
        # pre-normalized float32 — decisive when the transport is slow
        # (the tunneled runtime moves ~20-45 MB/s) and strictly less host
        # work in production either way.
        self.image_uint8 = image_uint8
        self._host_dtype = np.uint8 if image_uint8 else np.float32
        # prefill attention ablation mode (None == "mma"); decode is plain
        # causal over the cache in all three modes (see engine.prefill)
        self.attn_mode = attn_mode

        self.state = self._make_empty_state(num_slots)
        # Tail compaction: once the queue/uploader are empty (pure drain
        # tail), decode cost is dominated by the DENSE slot-cache read —
        # every step streams all ``num_slots`` rows regardless of how many
        # are live (a 48-slot int8 read is ~20 ms/step of the 27 ms total).
        # When occupancy falls to <= num_slots/2 (then /4), the engine
        # moves the live rows to the FRONT of the (always full-width)
        # buffers with small in-place chunked row moves and decodes with a
        # static ``live_width`` — the int8-KV decode then reads only that
        # batch prefix of the cache (the slice fuses into the dots; no
        # narrow cache copy is ever materialized, so there is no HBM
        # transient — a gather into narrower buffers OOMs at 48-slot 4B
        # geometry). Expansion back to full width is FREE: rows past the
        # live prefix are stale garbage that admission fully overwrites.
        self._live = num_slots
        self._last_width = num_slots   # decode width used by the last tick
        self._compact_widths = []
        if compact_tail:
            self._compact_widths = sorted(
                {num_slots // 2, num_slots // 4} - {0}
            )
        s = cfg.siglip.image_size
        self._zero_img = self._put(np.zeros((s, s, 3), self._host_dtype))
        # host bookkeeping
        self.slot_req: list[Request | None] = [None] * num_slots
        self.queue: "queue.Queue[Request]" = queue.Queue()
        # ready-to-admit requests drained from the queue (scheduler-thread
        # local; the length-window admission picks from here)
        self._ready: list[Request] = []
        # id() of a head-of-line request the length-window admission has
        # already passed over once (anti-starvation marker)
        self._head_id = None
        self._rng = jax.random.PRNGKey(0)
        # background uploader: host images batch-transfer on a side thread
        # (device_put blocks its caller ~0.5 s + bytes/45 MB/s through a
        # tunneled runtime; batched + threaded, the transfer wall-clock
        # hides behind in-flight decode). Requests enter self.queue only
        # once their pixels are device-resident.
        self._upload_q: list[Request] = []
        self._upload_inflight = 0
        self._upload_cv = threading.Condition()
        self._upload_pool: list[threading.Thread] = []
        self._shutdown = False
        # lag-1 chunks in flight: [(device toks, slot->request snapshot at
        # dispatch time)]. The host fetches chunk N's tokens while the
        # device executes chunk N+1 — the per-chunk tunnel round-trip
        # (~30 ms) and all bookkeeping hide behind compute.
        self._pending: list = []
        # decode chunks dispatched so far: the deterministic progress
        # counter (run_until_drained's tick count includes idle ticks spent
        # waiting on the uploader thread, which varies with host load)
        self.decode_dispatches = 0
        # device-program dispatch log: (kind, key, host wall timestamp).
        # kind "decode" keys (chunk_len, live_width); kind "prefill" keys
        # (batch, bucket). A drain's chip-busy fraction is
        # sum(count[key] * independently-measured device time[key]) / wall
        # — the tunneled runtime can't report device time in-band
        # (block_until_ready doesn't block), so attribution replays each
        # compiled program amortized and multiplies by these counts
        # (exp/server_chipbusy.py).
        # bounded: a long-running server must not leak accounting state —
        # 1<<16 entries cover hours of dispatches; attribution harnesses
        # clear() per drain so the window never truncates a measurement
        from collections import deque

        self.dispatch_log: deque = deque(maxlen=1 << 16)
        # per-request completion wall timestamps (host accounting time):
        # lets a long drain report its steady-state middle-window rate,
        # excluding the cold ramp and the occupancy tail
        self.completion_log: deque = deque(maxlen=1 << 16)

        # donate the slot state: the fused admission prefill updates it
        # in place (argnums count from the bound method's params arg)
        self._prefill_batch = jax.jit(self._prefill_batch_impl,
                                      donate_argnums=(4,))
        # split-path insert kept as the fused path's differential oracle
        # (tests) — production admission no longer calls it
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))
        # tail-compaction row moves: same-shape donation aliases the full
        # buffers, and the <=8-row chunk bounds the gather temp to ~1 GB
        self._move = jax.jit(self._move_impl, donate_argnums=(0,))
        self._move_chunk = min(8, num_slots)
        # one jitted decode per chunk length (budget-aware chunking sizes
        # each chunk to the next completion boundary)
        self._decode_fns: dict[int, object] = {}

    def _put(self, x):
        """Host array -> device; replicated onto the mesh under TP (a
        committed single-device array cannot feed a jit whose other
        operands are mesh-sharded)."""
        if self._rep is not None:
            return jax.device_put(x, self._rep)
        return jax.device_put(x)

    def _make_empty_state(self, width: int) -> GenState:
        """Fresh zeroed GenState with ``width`` slot rows (TP shardings
        applied). Used at init and when expanding back from a compacted
        tail width."""
        if self.kv_int8:
            from ..models.phi3 import KVCacheQ

            cache = KVCacheQ.create(self.cfg.phi3, width, self.max_len)
        else:
            cache = KVCache.create(self.cfg.phi3, width, self.max_len,
                                   dtype=self.policy.compute_dtype)
        if self.tp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..models.phi3 import KVCacheQ

            # slot cache shards over heads on the tensor axis (the flat
            # int8 layout's last dim is Hkv*D — head-major, so a last-dim
            # shard IS a head shard); scales follow their rows
            if isinstance(cache, KVCacheQ):
                row = NamedSharding(
                    self.tp_mesh, P(None, None, None, "tensor")
                )
                cache = KVCacheQ(
                    k=jax.device_put(cache.k, row),
                    ks=jax.device_put(cache.ks, row),
                    v=jax.device_put(cache.v, row),
                    vs=jax.device_put(cache.vs, row),
                )
            else:
                hsh = NamedSharding(
                    self.tp_mesh, P(None, None, None, "tensor", None)
                )
                cache = KVCache(
                    k=jax.device_put(cache.k, hsh),
                    v=jax.device_put(cache.v, hsh),
                )
        return GenState(
            cache=cache,
            kv_valid=self._put(jnp.zeros((width, self.max_len), jnp.int32)),
            lengths=self._put(jnp.zeros((width,), jnp.int32)),
            last_logits=self._put(jnp.zeros(
                (width, self.cfg.output_vocab), jnp.float32
            )),
        )

    def _move_impl(self, state: GenState, src, dst):
        """In-place slot-row moves rows[dst] = rows[src] (same-shape
        donated update — XLA aliases the full buffers; the only transient
        is the <=move_chunk gathered rows)."""
        from ..models.phi3 import KVCacheQ

        mv = lambda x: x.at[:, dst].set(x[:, src])
        if isinstance(state.cache, KVCacheQ):
            cache = KVCacheQ(k=mv(state.cache.k), ks=mv(state.cache.ks),
                             v=mv(state.cache.v), vs=mv(state.cache.vs))
        else:
            cache = KVCache(k=mv(state.cache.k), v=mv(state.cache.v))
        return GenState(
            cache=cache,
            kv_valid=state.kv_valid.at[dst].set(state.kv_valid[src]),
            lengths=state.lengths.at[dst].set(state.lengths[src]),
            last_logits=state.last_logits.at[dst].set(
                state.last_logits[src]
            ),
        )

    def _compact_to(self, width: int, occupied: list[int]):
        """Move the occupied slot rows to the front (ascending src ->
        ascending dst with src[i] >= dst[i], so chunked in-order moves
        never clobber a not-yet-moved source row) and shrink the decode's
        live prefix to ``width``. Buffers stay full-size."""
        moves = [(s, d) for d, s in enumerate(occupied) if s != d]
        c = self._move_chunk
        for i in range(0, len(moves), c):
            chunk = moves[i:i + c]
            # pad to the fixed chunk shape with identity moves on the LAST
            # row: real dsts are < num_slots/2, so the pad never duplicates
            # a destination index (a duplicate dst in one scatter makes the
            # winning write unspecified — padding with (0,0) while a real
            # move targets row 0 reverted that row, caught by
            # test_server_compact_tail_matches_one_shot)
            pad = self.num_slots - 1
            while len(chunk) < c:
                chunk.append((pad, pad))
            src = jnp.asarray([m[0] for m in chunk], jnp.int32)
            dst = jnp.asarray([m[1] for m in chunk], jnp.int32)
            self.state = self._move(self.state, src, dst)
        reqs = [self.slot_req[i] for i in occupied]
        self.slot_req = reqs + [None] * (self.num_slots - len(reqs))
        self._live = width

    def _get_decode(self, n: int, live: int | None = None):
        if live is not None and live >= self.num_slots:
            live = None
        if (n, live) not in self._decode_fns:
            import functools

            self._decode_fns[(n, live)] = jax.jit(
                functools.partial(self._decode_impl, length=n,
                                  live_width=live),
                donate_argnums=(1,),
            )
        return self._decode_fns[(n, live)]

    # -- jitted device functions ---------------------------------------------
    def _prefill_batch_impl(self, params, ids, img, valid, state, slots):
        """Fused admission: prefill writes K/V straight into the donated
        slot cache (row r -> slot ``slots[r]``; index == num_slots drops
        padded rows) and scatters the bookkeeping — no temp batch-sized
        GenState, no separate insert pass (which cost ~21.5 ms per bs16
        admission at AKI-4B plus a 16-row temp cache of HBM,
        exp/admit_split.py)."""
        if self.image_uint8:
            # device-side normalization of uint8 RGB ingress; identical to
            # the host path (x/255 - 0.5)/0.5 == x/127.5 - 1
            img = img.astype(jnp.float32) / 127.5 - 1.0
        return prefill(params, self.cfg, ids, img, valid,
                       max_len=self.max_len, policy=self.policy,
                       kv_int8=self.kv_int8, tp_mesh=self.tp_mesh,
                       attn_mode=self.attn_mode,
                       slot_state=state, slots=slots)

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

    def _decode_impl(self, params, state: GenState, active, key,
                     length: int | None = None,
                     live_width: int | None = None):
        def one(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            tok = sample(st.last_logits, self.sampling, sub)
            tok = jnp.where(
                active, tok, self.cfg.pad_token_id
            ).astype(jnp.int32)
            new_state = decode_step(params, self.cfg, st, tok,
                                    policy=self.policy,
                                    live_width=live_width)
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
            one, (state, key), None,
            length=self.decode_chunk if length is None else length,
        )
        return state, toks  # toks: (length, num_slots)

    # -- host API ---------------------------------------------------------------
    def warmup(self):
        """Compile every device function ahead of serving: the decode chunk
        and one prefill+insert per (power-of-two admission size x prompt
        bucket). Through a tunneled runtime each compile is tens of
        seconds — production engines pay this at startup, never
        mid-traffic."""
        s = self.cfg.siglip.image_size
        for t in self.prompt_buckets:
            # non-max buckets serve only FULL admissions (_admit_many routes
            # partial batches to the max bucket), so they need exactly one
            # compiled size; the max bucket warms every power of two
            b = 1 if t == self.prompt_bucket else self.admit_batch
            while True:
                ids = np.full((b, t), self.cfg.pad_token_id, np.int32)
                valid = np.zeros((b, t), np.int32)
                valid[:, 0] = 1
                imgs = jnp.stack([self._zero_img] * b)
                slot_idx = np.full((b,), self.num_slots, np.int32)  # drop
                self.state = self._prefill_batch(
                    self.params, jnp.array(ids), imgs, jnp.array(valid),
                    self.state, jnp.array(slot_idx),
                )
                # serialize: with async dispatch every warmup size's
                # prefill activations would be live at once (HBM OOM at 4B)
                np.asarray(self.state.lengths)
                if b >= self.admit_batch:
                    break
                b = min(b * 2, self.admit_batch)
        # one realistic chunk-sized upload: the first big host->device
        # transfer of a process pays connection/pool setup that otherwise
        # lands in the first drain's ramp (drain0 measured ~1s slower
        # than steady state with identical host-loop time)
        rows = np.zeros((self.upload_chunk, s, s, 3), self._host_dtype)
        float(np.asarray(self._put(rows)[0, 0, 0, 0]))
        # the decode chunk (fixed-size: step() never dispatches other
        # lengths since budget-aware chunking was removed)
        self._rng, sub = jax.random.split(self._rng)
        self.state, toks = self._get_decode(self.decode_chunk)(
            self.params, self.state,
            jnp.zeros((self.num_slots,), bool), sub,
        )
        np.asarray(toks)
        # tail-compaction paths: every gather pair, the decode chunk at
        # each narrow width, and the expand scatter — a mid-drain compile
        # through a tunneled runtime costs tens of seconds
        if self._compact_widths:
            # trace the row-move program once (identity moves on row 0)
            # and the decode chunk at each compaction live-width
            zero = jnp.zeros((self._move_chunk,), jnp.int32)
            self.state = self._move(self.state, zero, zero)
            np.asarray(self.state.lengths)
            for w in sorted(self._compact_widths, reverse=True):
                self._live = w
                self._rng, sub = jax.random.split(self._rng)
                self.state, toks = self._get_decode(self.decode_chunk, w)(
                    self.params, self.state,
                    jnp.zeros((self.num_slots,), bool), sub,
                )
                np.asarray(toks)
            self._live = self.num_slots

    def _uploader_loop(self, idx: int = 0):
        while True:
            with self._upload_cv:
                # idx gate: threads past upload_threads idle (lets a live
                # engine be A/B'd between 1 and N uploaders without
                # killing threads)
                while (not self._shutdown
                       and (not self._upload_q or idx >= self.upload_threads)):
                    self._upload_cv.wait()
                if self._shutdown and not self._upload_q:
                    return
                n = self.upload_chunk
                if self._ramp_pops > 0:
                    self._ramp_pops -= 1
                    n = max(1, n // 2)
                batch = self._upload_q[:n]
                del self._upload_q[:n]
                # count the popped batch as still-pending until its rows
                # land in the admission queue: between the pop and the
                # queue.put the transfer is in flight, and a drain loop
                # that polls _pending_uploads() must not conclude "no
                # work" mid-transfer (a replicated 8-way device_put is
                # slow enough to lose the race reliably)
                # additive: several uploader threads may hold chunks in
                # flight at once
                self._upload_inflight += len(batch)
            try:
                rows = np.stack([
                    np.asarray(r.image, self._host_dtype) for r in batch
                ])
                chunk = self._put(rows)  # ONE transfer per group
                for i, r in enumerate(batch):
                    r._image_dev = chunk[i]   # device-side slice, no copy
                    self.queue.put(r)
            except Exception:
                # fail open: requests stay servable via the host-row path
                # in _admit_many (a dead uploader must not hang the drain)
                for r in batch:
                    self.queue.put(r)
            finally:
                with self._upload_cv:
                    self._upload_inflight -= len(batch)

    def _pending_uploads(self) -> int:
        with self._upload_cv:
            return len(self._upload_q) + self._upload_inflight

    def close(self):
        with self._upload_cv:
            self._shutdown = True
            self._upload_cv.notify_all()

    def submit(self, input_ids: list[int], image: np.ndarray,
               max_new_tokens: int = 128, eos_id: int | None = None) -> Request:
        req = Request(input_ids=list(input_ids), image=image,
                      max_new_tokens=max_new_tokens, eos_id=eos_id)
        if isinstance(image, jax.Array):
            # caller already holds a device array: free, admit directly
            req._image_dev = image
            self.queue.put(req)
            return req
        # Host pixels ride the uploader thread: per-request device_put
        # blocks ~0.5 s each through a tunneled runtime, so the uploader
        # stacks up to admit_batch pending rows into ONE transfer and the
        # engine keeps decoding while it runs. The request only becomes
        # admissible once its pixels are resident.
        with self._upload_cv:
            while len(self._upload_pool) < self.upload_threads:
                t = threading.Thread(
                    target=self._uploader_loop,
                    args=(len(self._upload_pool),), daemon=True,
                )
                self._upload_pool.append(t)
                t.start()
            if (self.upload_ramp and not self._upload_q
                    and self._upload_inflight == 0):
                # a fresh burst: seed the first admissions with half chunks
                self._ramp_pops = self.upload_threads
            self._upload_q.append(req)
            self._upload_cv.notify_all()
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
        # smallest bucket covering the batch's longest prompt — but only
        # FULL batches use the tight buckets: partial (tail) admissions run
        # at the max bucket so warmup compiles O(buckets + sizes) programs,
        # not O(buckets x sizes) (each 4B compile through a tunneled
        # runtime is tens of seconds)
        if b < self.admit_batch and len(self.prompt_buckets) > 1:
            t = self.prompt_bucket
        else:
            need = max(min(len(r.input_ids), self.prompt_bucket)
                       for r in reqs)
            t = next(bk for bk in self.prompt_buckets if bk >= need)
        ids = np.full((b, t), self.cfg.pad_token_id, np.int32)
        valid = np.zeros((b, t), np.int32)
        slot_idx = np.full((b,), self.num_slots, np.int32)  # OOB -> drop
        img_rows = []
        for r, (slot, req) in enumerate(zip(slots, reqs)):
            n = min(len(req.input_ids), t)
            ids[r, :n] = req.input_ids[:n]
            valid[r, :n] = 1
            img_rows.append(req._image_dev if req._image_dev is not None
                            else np.asarray(req.image, self._host_dtype))
            slot_idx[r] = slot
        # dummy rows still need one valid token (prefill assumes non-empty)
        for r in range(len(reqs), b):
            valid[r, 0] = 1
            img_rows.append(self._zero_img)
        if any(isinstance(im, np.ndarray) for im in img_rows):
            # direct _admit_many callers may still hand host rows: ONE
            # batched H2D (per-row device_puts pay a full per-transfer
            # setup each — seconds per drain through a tunneled runtime)
            imgs = self._put(np.stack([
                np.asarray(im, self._host_dtype) for im in img_rows
            ]))
        else:
            imgs = jnp.stack(img_rows)   # all rows already on device
        import time as _time

        self.dispatch_log.append(("prefill", (b, t), _time.perf_counter()))
        self.state = self._prefill_batch(
            self.params, jnp.array(ids), imgs, jnp.array(valid),
            self.state, jnp.array(slot_idx),
        )
        for slot, req in zip(slots, reqs):
            self.slot_req[slot] = req
            req._tokens = []
            req._dispatched = 0

    def _admit_free(self):
        """Fill free slots from the queue (subject to admit_policy).

        "batched" holds a partial admission whenever waiting would let a
        FULLER batch form — either because busy slots will free (the
        original rule) or because the uploader has requests mid-transfer
        (without this, a drain's opening ticks admit 1-2-request dribbles
        as the first upload group lands, and each dribble pays a full
        prefill dispatch; measured as fragmented admissions [(1,1),(2,2),
        (15,1)] on drain 0 vs [(16,4),(12,2)] once upload-aware).
        Recomputed per batch so a leftover tail below ``admit_batch`` is
        only admitted when nothing more is coming.

        With several prompt buckets configured, admission picks the
        ``admit_batch`` SHORTEST prompts from the whole backlog — a
        batch's prefill runs at the bucket of its LONGEST prompt, so
        mixing one long prompt into fifteen short ones wastes the whole
        batch's headroom. Anti-starvation: the head-of-line request is
        force-included after being passed over once, so under sustained
        short-prompt traffic a long prompt waits at most two
        admissions."""
        while True:
            # drain the thread-safe queue into the local ready list
            while True:
                try:
                    self._ready.append(self.queue.get_nowait())
                except queue.Empty:
                    break
            if self._ready and self._live < self.num_slots:
                # restore the full slot pool — free: buffers never shrank,
                # rows past the live prefix are stale garbage admission
                # overwrites
                self._live = self.num_slots
            free = [i for i, r in enumerate(self.slot_req) if r is None]
            ready = len(self._ready)
            if not free or ready == 0:
                return
            if self.admit_policy == "batched":
                incoming = ready + self._pending_uploads()
                if min(len(free), ready) < min(self.admit_batch, incoming):
                    return   # a fuller batch is forming — hold
            n_take = min(len(free), self.admit_batch, ready)
            if self.align_completions or len(self.prompt_buckets) > 1:
                # Sort the WHOLE backlog, not a bounded window: under a
                # deep backlog the admit_batch best-matched of the full
                # list form a tight band (a 2x-admit_batch window's
                # "shortest 16 of 32" straddles the median — the round-3
                # two-bucket experiment measured WORSE for exactly this
                # reason). Primary key (align_completions): chunks-to-
                # completion, so a cohort's slots free TOGETHER — decode
                # reads the full live-width cache every step regardless of
                # how many slots are active, and misaligned completions
                # were measured as mean occupancy 30/48 (35% of the decode
                # bandwidth spent on finished slots). Secondary: prompt
                # length, so tight cohorts also ride small prefill
                # buckets. Fairness: completion order trades toward
                # throughput; the head-of-line force-include below still
                # bounds any single request's wait to two admissions once
                # it reaches the FIFO head.
                window = list(range(ready))

                def _key(i):
                    r = self._ready[i]
                    chunks = -(-r.max_new_tokens // self.decode_chunk)
                    return (
                        chunks if self.align_completions else 0,
                        len(r.input_ids),
                    )

                window.sort(key=_key)
                picked = window[:n_take]
                if 0 not in picked and id(self._ready[0]) == self._head_id:
                    # head-of-line was already skipped once — force it in
                    # (a steady short-prompt stream would otherwise starve
                    # a long prompt forever)
                    picked[-1] = 0
                head = self._ready[0]
                self._head_id = id(head) if 0 not in picked else None
                picked = sorted(picked)  # keep FIFO order inside the batch
            else:
                picked = list(range(n_take))
            take_reqs = [self._ready[i] for i in picked]
            for i in reversed(picked):
                del self._ready[i]
            take_slots = free[:len(take_reqs)]
            if not take_reqs:
                return
            self._admit_many(take_slots, take_reqs)

    def _process_chunk(self, toks: np.ndarray, snapshot: list):
        """Account one fetched chunk against the slot->request bindings
        that were live when it was dispatched (the live slot may already
        hold a NEWER request — early slot release)."""
        for slot in range(len(snapshot)):
            req = snapshot[slot]
            if req is None or req._result.qsize():
                continue   # empty slot, or request already completed
            for k in range(toks.shape[0]):
                if len(req._tokens) >= req.max_new_tokens:
                    break
                t = int(toks[k, slot])
                done = (req.eos_id is not None and t == req.eos_id)
                if not done:
                    req._tokens.append(t)
                if done or len(req._tokens) >= req.max_new_tokens:
                    import time as _time

                    self.completion_log.append(_time.perf_counter())
                    req._result.put(req._tokens)
                    # free by IDENTITY, not snapshot index: tail
                    # compaction may have moved the request to a
                    # different slot since this chunk was dispatched
                    for i, live in enumerate(self.slot_req):
                        if live is req:
                            self.slot_req[i] = None
                            break
                    break

    def _flush_pending(self):
        while self._pending:
            toks, snapshot = self._pending.pop(0)
            self._process_chunk(np.asarray(toks), snapshot)

    def step(self) -> int:
        """One scheduler tick — budget-aware chunking, lag-1 asynchrony:

        1. admit queued requests into free slots (their prefill+insert
           enqueue ahead of this tick's chunk, so newcomers decode in it);
        2. size the chunk to the next completion boundary: every request's
           ``max_new_tokens`` is known, so the chunk ends exactly when the
           first active request exhausts its budget (pow-2 bucketed; eos
           can still end a request earlier — those tokens are dropped at
           accounting, same as before);
        3. dispatch; requests whose budget is now fully dispatched release
           their slot IMMEDIATELY when they have no eos (their completion
           is deterministic) — the next tick readmits into the slot while
           this chunk is still executing on device (the insert enqueues
           after it, so the overwrite is ordered);
        4. fetch + account the PREVIOUS chunk while this one runs (the
           per-chunk tunnel round-trip hides behind compute).

        Returns the number of active slots at dispatch time.
        """
        if not any(r is not None for r in self.slot_req):
            # idle: account stragglers so their slots free for admission
            self._flush_pending()
        self._admit_free()

        if (self._compact_widths and self.queue.empty()
                and not self._ready and self._pending_uploads() == 0):
            # pure drain tail: nothing left to admit — shrink the decode's
            # live prefix to the smallest compaction level covering the
            # occupied slots (the dense cache read scales with the prefix)
            occupied = [i for i, r in enumerate(self.slot_req)
                        if r is not None]
            if occupied:
                target = next(
                    (w for w in self._compact_widths
                     if len(occupied) <= w and w < self._live), None
                )
                if target is not None:
                    self._compact_to(target, occupied)

        remaining = [
            (req.max_new_tokens - req._dispatched) if req is not None else 0
            for req in self.slot_req
        ]
        active = [r > 0 for r in remaining]
        n_active = sum(active)
        if n_active:
            # fixed-size chunks: sizing chunks to completion boundaries
            # fragments them (measured 36 tiny chunks/drain, each paying
            # ~50 ms dispatch+RTT through the tunnel). Overshoot steps
            # past a request's budget are free — decode cost is weight-
            # read bound and flat in the active count — and accounting
            # drops the garbage tokens.
            n = self.decode_chunk
            live = self._live
            if self._compact_widths:
                # Width tracking beyond the drain tail: decode at the
                # smallest compiled width covering the HIGHEST occupied
                # slot (free slots are taken in ascending order, so the
                # ramp-up ticks — admissions still trailing the uploader —
                # are front-packed). The drain's opening 3-5 ticks run at
                # 16-32 occupancy; reading the full 48-wide cache for them
                # wastes ~10 ms/step of the ~27 ms step (the cache read is
                # the dominant term and scales with the width prefix).
                # After tail compaction rows are front-packed too, so the
                # same rule subsumes the old self._live plumbing.
                hi = 1 + max(i for i, r in enumerate(self.slot_req)
                             if r is not None)
                live = next(
                    (w for w in self._compact_widths if w >= hi),
                    self.num_slots,
                )
            self._last_width = live
            self.decode_dispatches += 1
            import time as _time

            self.dispatch_log.append(
                ("decode", (n, live), _time.perf_counter())
            )
            self._rng, sub = jax.random.split(self._rng)
            self.state, toks = self._get_decode(n, live)(
                self.params, self.state, jnp.array(active), sub
            )
            # start the D2H copy of this chunk's tokens NOW: by the time
            # the lag-1 fetch calls np.asarray the bytes are already on the
            # host, so the fetch pays ~0 instead of a full tunnel
            # round-trip per chunk (a best-effort hint; np.asarray is the
            # correctness path either way)
            try:
                toks.copy_to_host_async()
            except Exception:
                pass
            snapshot = list(self.slot_req)
            for slot, req in enumerate(self.slot_req):
                if req is not None and active[slot]:
                    req._dispatched += n
                    if (req._dispatched >= req.max_new_tokens
                            and req.eos_id is None):
                        # deterministic completion: free the slot now;
                        # accounting still runs against the snapshot
                        self.slot_req[slot] = None
            self._flush_pending()
            self._pending.append((toks, snapshot))
        else:
            self._flush_pending()
        return n_active

    def has_work(self) -> bool:
        return (not self.queue.empty() or bool(self._ready)
                or self._pending_uploads() > 0
                or bool(self._pending)
                or any(r is not None for r in self.slot_req))

    def run_until_drained(self, max_steps: int = 100000,
                          idle_timeout: float = 120.0):
        """Run scheduler ticks until no work remains.

        Idle ticks (nothing decodable — admission held for a forming
        batch, or the uploader mid-transfer) SLEEP and do not count
        against ``max_steps``: on a small host the old hot-spin both
        starved the uploader thread of the GIL and burned through
        max_steps in seconds, silently returning with requests still
        queued (observed as unfulfilled handles on the 1-core bench
        host). A dead uploader now raises after ``idle_timeout`` seconds
        of consecutive idleness instead of hanging or lying.
        """
        import time as _time

        steps = 0
        idle_since = None
        while self.has_work() and steps < max_steps:
            n = self.step()
            if n == 0 and self.has_work():
                # nothing decodable: waiting on uploads / held admission —
                # yield the GIL instead of hot-spinning scheduler ticks
                if idle_since is None:
                    idle_since = _time.perf_counter()
                elif _time.perf_counter() - idle_since > idle_timeout:
                    raise RuntimeError(
                        f"serving drain stalled: no dispatchable work for "
                        f"{idle_timeout:.0f}s "
                        f"(queue {self.queue.qsize()}, ready "
                        f"{len(self._ready)}, uploads in flight "
                        f"{self._pending_uploads()})"
                    )
                _time.sleep(0.002)
            else:
                idle_since = None
                steps += 1
        return steps
