"""Chip-busy attribution for a server drain — which side of the tunnel
owns the 22.0-offline vs 16.x-server gap?

Methodology (the tunneled runtime can't report device time in-band —
block_until_ready doesn't block, jax.profiler has no device trace):

1. run drains through the bench-config ServingEngine; the engine logs every
   device-program dispatch as (kind, key, t) — decode keyed (chunk, live
   width), prefill keyed (batch, bucket) — plus per-request completion
   timestamps;
2. REPLAY each distinct compiled program on its own, amortized over >= 8
   chained calls (state threads through, so the chain serializes; one host
   fetch forces the tail) — that is that program's device time;
3. drain chip-busy = sum(count[key] * device_ms[key]) / wall.

Whatever the chip-busy fraction does NOT cover is host work + tunnel
transport (dispatch RTTs, token fetches, upload interference).

A long drain (NREQ=384) additionally reports the steady-state
middle-window rate: completions 25%..75%, by the completion log — ramp
(cold uploads) and tail (falling occupancy) excluded.

PYTHONPATH=/root/repo:/root/.axon_site python exp/server_chipbusy.py
Knobs: SLOTS=48 ADMIT=32 CHUNK=8 NREQ=96 NDRAIN=3 UPCHUNK=16
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("FORCE_CPU", "0") == "1":
    # the env var JAX_PLATFORMS=cpu alone does not beat the axon plugin
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aki_tpu.infer.server import ServingEngine
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import Policy
from aki_tpu.models.configs import aki_4b, aki_tiny
from aki_tpu.models.quant import quantize_params

SLOTS = int(os.environ.get("SLOTS", "48"))
ADMIT = int(os.environ.get("ADMIT", "32"))
# paired admit-depth A/B: one engine constructed (and warmed) at the max,
# then eng.admit_batch toggled per drain — the chip-busy attribution showed
# admit32-into-48-slots runs cohort-serial at width 32 (52 decode chunks vs
# a 32-chunk minimum on the 384-request drain), so full-slot cohorts are
# the candidate fix
ADMITS = [int(x) for x in os.environ.get("ADMITS", str(ADMIT)).split(",")]
CHUNK = int(os.environ.get("CHUNK", "8"))
NREQS = [int(x) for x in os.environ.get("NREQ", "96").split(",")]
NREQ = max(NREQS)
NDRAIN = int(os.environ.get("NDRAIN", "3"))
UPCHUNK = int(os.environ.get("UPCHUNK", "16"))
TEXT_LEN = 512
MAX_LEN = int(os.environ.get("MAXLEN", "704"))


def measure_decode(eng, key, reps=8):
    """Amortized device time of one compiled decode program: chain reps
    calls (state threads through -> serialized), fetch once."""
    n, live = key
    fn = eng._get_decode(n, live)
    active = jnp.zeros((eng.num_slots,), bool)
    sub = jax.random.PRNGKey(7)
    # warm (already compiled by the drain; this orders the timeline)
    eng.state, toks = fn(eng.params, eng.state, active, sub)
    np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(reps):
        eng.state, toks = fn(eng.params, eng.state, active, sub)
    np.asarray(toks)
    return (time.perf_counter() - t0) / reps * 1e3


def measure_prefill(eng, key, reps=4):
    b, t = key
    ids = np.full((b, t), eng.cfg.pad_token_id, np.int32)
    valid = np.zeros((b, t), np.int32)
    valid[:, 0] = 1
    imgs = jnp.stack([eng._zero_img] * b)
    slots = jnp.full((b,), eng.num_slots, jnp.int32)  # drop rows
    ids, valid = jnp.array(ids), jnp.array(valid)
    eng.state = eng._prefill_batch(eng.params, ids, imgs, valid,
                                   eng.state, slots)
    float(np.asarray(eng.state.lengths[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        eng.state = eng._prefill_batch(eng.params, ids, imgs, valid,
                                       eng.state, slots)
    float(np.asarray(eng.state.lengths[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = aki_4b() if on_tpu else aki_tiny()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: quantize_params(
        init_aki(k, cfg, dtype=jnp.bfloat16), mode="w8a8"
    ))(jax.random.PRNGKey(0))

    eng = ServingEngine(
        params, cfg, num_slots=SLOTS, max_len=MAX_LEN,
        prompt_bucket=TEXT_LEN, admit_batch=max(ADMITS),
        admit_policy="batched",
        decode_chunk=CHUNK, kv_int8=True, image_uint8=True, policy=policy,
        compact_tail=True, upload_chunk=UPCHUNK,
    )

    s = cfg.siglip.image_size
    rng2 = np.random.RandomState(1)
    reqs = []
    for i in range(NREQ):
        n = int(rng2.randint(TEXT_LEN // 2, TEXT_LEN))
        rid = rng2.randint(5, cfg.initial_tokenizer_len - 1, size=n)
        rid[1] = cfg.media_token_id
        rid[40 % n] = cfg.assistant_token_id
        reqs.append((rid.tolist(),
                     rng2.randint(0, 256, (s, s, 3)).astype(np.uint8),
                     int(rng2.randint(16, 48))))

    t0 = time.perf_counter()
    eng.warmup()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)
    # small unmeasured warm drain (bench.py does the same)
    wh = [eng.submit(r, im, max_new_tokens=m) for r, im, m in reqs[:16]]
    eng.run_until_drained()
    for h in wh:
        h.result(timeout=10)

    drain_logs = []
    # alternate arms within each repeat so tunnel weather pairs across arms
    plan = [(n, a) for n in NREQS for _ in range(NDRAIN) for a in ADMITS]
    for d, (nr, admit) in enumerate(plan):
        eng.admit_batch = admit   # every size <= max(ADMITS) is warmed
        eng.dispatch_log.clear()
        eng.completion_log.clear()
        t0 = time.perf_counter()
        handles = [eng.submit(r, im, max_new_tokens=m)
                   for r, im, m in reqs[:nr]]
        eng.run_until_drained()
        missing = []
        for i, h in enumerate(handles):
            try:
                h.result(timeout=10)
            except Exception:
                missing.append(i)
        if missing:
            # dump engine state: a drained engine with unfulfilled handles
            # is a scheduler bug — capture everything
            print(f"drain{d}: {len(missing)} handles EMPTY: {missing[:8]}")
            for i in missing[:4]:
                r = handles[i]
                print(f"  req{i}: tokens {len(r._tokens)}/"
                      f"{r.max_new_tokens} dispatched {r._dispatched} "
                      f"in slot_req {r in eng.slot_req} "
                      f"in ready {r in eng._ready}")
            print(f"  queue {eng.queue.qsize()} ready {len(eng._ready)} "
                  f"uploads {eng._pending_uploads()} "
                  f"pending {len(eng._pending)} "
                  f"occupied {sum(r is not None for r in eng.slot_req)}")
            raise SystemExit(1)
        wall = time.perf_counter() - t0
        comp = [c - t0 for c in eng.completion_log]
        # steady-state middle window: completions 25%..75%
        q1, q3 = nr // 4, (3 * nr) // 4
        mid = (q3 - q1) / (comp[q3] - comp[q1]) if len(comp) >= q3 + 1 else 0
        counts = {}
        for kind, key, _ in eng.dispatch_log:
            counts[(kind, key)] = counts.get((kind, key), 0) + 1
        drain_logs.append((wall, counts, mid, nr, admit))
        print(f"drain{d}[n={nr} admit={admit}]: {nr / wall:5.2f} img/s "
              f"wall {wall:6.2f}s mid-window {mid:5.2f} img/s "
              f"dispatches {sorted(counts.items())}", flush=True)

    # replay every program key seen in any drain
    keys = sorted({k for _, c, _, _, _ in drain_logs for k in c})
    dev_ms = {}
    for kind, key in keys:
        dev_ms[(kind, key)] = (measure_decode(eng, key) if kind == "decode"
                               else measure_prefill(eng, key))
        print(f"device {kind} {key}: {dev_ms[(kind, key)]:7.1f} ms",
              flush=True)

    print("\n== attribution ==")
    for d, (wall, counts, mid, nr, admit) in enumerate(drain_logs):
        chip = {}
        for k, n in counts.items():
            chip[k] = n * dev_ms[k]
        chip_s = sum(chip.values()) / 1e3
        dec = sum(v for (kind, _), v in chip.items() if kind == "decode")
        pre = sum(v for (kind, _), v in chip.items() if kind == "prefill")
        print(f"drain{d}[n={nr} admit={admit}]: wall {wall:6.2f}s  "
              f"chip {chip_s:5.2f}s "
              f"({100 * chip_s / wall:4.1f}% busy: decode {dec / 1e3:.2f}s "
              f"prefill {pre / 1e3:.2f}s)  stall {wall - chip_s:5.2f}s  "
              f"mid-window {mid:5.2f} img/s", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} slots={SLOTS} admit={ADMIT} "
          f"chunk={CHUNK} nreq={NREQ} upchunk={UPCHUNK}", flush=True)
    main()
