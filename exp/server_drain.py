"""Instrumented server drain — where does the drain wall-clock go?

Replicates bench.py's server phase (96 mixed-arrival requests through a
48-slot engine) with per-tick accounting: admissions by size, decode ticks
by active count, and wall time attributed to admission vs decode dispatch
vs final sync.

PYTHONPATH=/root/repo:/root/.axon_site python exp/server_drain.py
Knobs: SLOTS=48 ADMIT=16 POLICY=batched CHUNK=8 NREQ=96 SORTLEN=0
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.server import ServingEngine
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import Policy
from aki_tpu.models.configs import aki_4b, aki_tiny
from aki_tpu.models.quant import quantize_params

SLOTS = int(os.environ.get("SLOTS", "48"))
ADMIT = int(os.environ.get("ADMIT", "16"))
POLICY = os.environ.get("POLICY", "batched")
CHUNK = int(os.environ.get("CHUNK", "8"))
NREQ = int(os.environ.get("NREQ", "96"))
SORTLEN = os.environ.get("SORTLEN", "0") == "1"
TEXT_LEN = 512
MAX_LEN = 704


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = aki_4b() if on_tpu else aki_tiny()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: quantize_params(
        init_aki(k, cfg, dtype=jnp.bfloat16), mode="w8a8"
    ))(jax.random.PRNGKey(0))

    imgu8 = os.environ.get("IMGU8", "1") == "1"
    compact = os.environ.get("COMPACT", "0") == "1"
    # BUCKETS="256,320,384,448,512": fine admission buckets (full-backlog
    # length-sorted batches ride the tightest one; partials use the max)
    buckets = tuple(
        int(x) for x in os.environ.get("BUCKETS", str(TEXT_LEN)).split(",")
    )
    align = os.environ.get("ALIGN", "1") == "1"
    upchunk = int(os.environ.get("UPCHUNK", "0")) or None
    upthreads = int(os.environ.get("UPTHREADS", "2"))
    eng = ServingEngine(
        params, cfg, num_slots=SLOTS, max_len=MAX_LEN,
        prompt_bucket=TEXT_LEN, prompt_buckets=buckets,
        admit_batch=ADMIT, admit_policy=POLICY,
        decode_chunk=CHUNK, kv_int8=True, image_uint8=imgu8, policy=policy,
        compact_tail=compact, align_completions=align,
        upload_chunk=upchunk, upload_threads=upthreads,
    )

    s = cfg.siglip.image_size
    rng2 = np.random.RandomState(1)
    reqs = []
    for i in range(NREQ):
        n = int(rng2.randint(TEXT_LEN // 2, TEXT_LEN))
        rid = rng2.randint(5, cfg.initial_tokenizer_len - 1, size=n)
        rid[1] = cfg.media_token_id
        rid[40 % n] = cfg.assistant_token_id
        img = (rng2.randint(0, 256, (s, s, 3)).astype(np.uint8) if imgu8
               else rng2.randn(s, s, 3).astype(np.float32))
        reqs.append((rid.tolist(), img, int(rng2.randint(16, 48))))
    if SORTLEN:
        reqs.sort(key=lambda r: len(r[0]))

    t0 = time.perf_counter()
    eng.warmup()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    # instrument: wrap _admit_many and count tick occupancy
    admits = []          # (batch size, prompt bucket, wall ms)
    orig_admit = eng._admit_many

    def admit_many(slots, rs):
        t = time.perf_counter()
        orig_admit(slots, rs)
        admits.append((len(rs), (time.perf_counter() - t) * 1e3))
    eng._admit_many = admit_many
    # record the decode live-width per tick (compaction diagnostics)
    eng._live_trace = []
    orig_step = eng.step

    def step():
        n = orig_step()
        if n:
            eng._live_trace.append(getattr(eng, "_last_width", eng._live))
        return n
    eng.step = step

    # AB=align: alternate align_completions off/on per drain (host-only
    # toggle, same engine + warmup) — paired drains cancel the shared
    # host's ±15% drift that single-config runs can't distinguish from
    # real effects
    ab = os.environ.get("AB", "")
    ndrain = int(os.environ.get("NDRAIN", "3"))
    for drain in range(ndrain):
        if ab == "align":
            eng.align_completions = bool(drain % 2)
        elif ab == "upthreads":
            # pool grows on demand in submit(); the idx gate idles extras
            eng.upload_threads = 2 if drain % 2 else 1
        elif ab == "upramp":
            eng.upload_ramp = bool(drain % 2)
            eng._ramp_pops = 0
        elif ab == "admit":
            # construct with ADMIT=<max> UPCHUNK=16 so warmup compiles
            # every power of two up to the max and uploads deliver
            # identically; the toggle itself is host-only scheduling state.
            # ABADMIT="16,32" gives the two arms.
            lo, hi = (int(x) for x in
                      os.environ.get("ABADMIT", "16,32").split(","))
            # warmup only compiled admission sizes up to the CONSTRUCTED
            # admit_batch — a bigger arm would pay a mid-traffic compile
            # (tens of seconds through the tunnel) and corrupt its drains
            assert max(lo, hi) <= ADMIT, (
                f"construct with ADMIT={max(lo, hi)} (got ADMIT={ADMIT}) "
                "so warmup covers both A/B arms")
            # tight buckets are only compiled at the constructed size;
            # a lo-arm FULL batch at a non-max bucket would be uncompiled
            assert len(buckets) == 1, "AB=admit is single-bucket only"
            eng.admit_batch = hi if drain % 2 else lo
        admits.clear()
        ticks = []       # active count per decode tick
        t0 = time.perf_counter()
        handles = [eng.submit(r, im, max_new_tokens=m) for r, im, m in reqs]
        t_dispatch = 0.0
        while eng.has_work():
            tt = time.perf_counter()
            n_active = eng.step()
            t_dispatch += time.perf_counter() - tt
            ticks.append(n_active)
            if n_active == 0 and eng.queue.empty():
                time.sleep(0.002)   # uploader mid-transfer: yield
        for h in handles:
            h.result(timeout=5)
        wall = time.perf_counter() - t0
        n_dec = sum(1 for t in ticks if t > 0)
        occ = [t for t in ticks if t > 0]
        adm_ms = sum(a[1] for a in admits)
        sizes = {}
        for b, _ in admits:
            sizes[b] = sizes.get(b, 0) + 1
        # occupancy histogram by quarters: ticks running the full-width
        # decode at low occupancy are the tail-compaction opportunity
        q = SLOTS // 4
        hist = [sum(1 for t in occ if (i * q) < t <= (i + 1) * q)
                for i in range(4)]
        lives = getattr(eng, "_live_trace", None)
        tag = ""
        if ab == "align":
            tag = f"[align={int(eng.align_completions)}]"
        elif ab == "upthreads":
            tag = f"[upthreads={eng.upload_threads}]"
        elif ab == "upramp":
            tag = f"[upramp={int(eng.upload_ramp)}]"
        elif ab == "admit":
            tag = f"[admit={eng.admit_batch}]"
        print(
            f"drain{drain}"
            + tag
            + f": {NREQ / wall:5.2f} img/s | wall {wall:6.2f}s | "
            f"host-loop {t_dispatch:5.2f}s (admit-dispatch {adm_ms / 1e3:5.2f}s) | "
            f"decode ticks {n_dec} (= {n_dec * CHUNK} steps) "
            f"occ mean {np.mean(occ):4.1f}/{SLOTS} min {min(occ)} "
            f"hist(quartiles) {hist} | "
            f"admissions {sorted(sizes.items())}"
            + (f" | live-widths {lives}" if lives else ""),
            flush=True,
        )
        if lives is not None:
            lives.clear()


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} slots={SLOTS} admit={ADMIT} "
          f"policy={POLICY} chunk={CHUNK} sortlen={SORTLEN}", flush=True)
    main()
