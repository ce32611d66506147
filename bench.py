"""Benchmark: AKI-4B images/sec/chip (prefill + decode) and TTFT percentiles.

Runs the full serving path — SigLIP encode -> perceiver -> splice -> MMA
flash prefill -> 32 causal decode steps — at the released AKI-4B geometry
with random bf16 weights (weights don't change FLOPs or bandwidth).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured images/sec divided by the north-star target of
3x an estimated A100 reference throughput.  The reference publishes no
throughput numbers (BASELINE.md), so the A100 estimate is analytic: torch
eager AKI-4B at bs8, ~35% MFU prefill + memory-bound decode on 2 TB/s HBM
=> ~8 img/s.  Target = 24 img/s/chip; vs_baseline >= 1.0 beats it.

Env knobs:
  AKI_BENCH_BATCH   batch size (default 48 — the measured throughput
                    optimum with the int8 KV cache: 19.8 img/s at bs32,
                    20.8 at bs48, ~equal at bs56; bs64 OOMs. bf16 KV OOMs
                    past bs16.)
  AKI_BENCH_QUANT   w8 | w8a8 | w4 | w4a8 | bf16   (default w8a8:
                    dynamic-int8 matmuls on the MXU's native int8 path,
                    vision tower included). The w4 modes halve decode
                    weight bytes but int4 arrays do not transfer through
                    the tunneled axon PJRT plugin (RecursionError) — usable
                    on direct-attached TPUs / CPU only.
  AKI_BENCH_KV8     1 -> int8 KV cache through the XLA inline-dequant
                    decode path (default 1: halves cache bytes AND beats
                    bf16 KV per step since the token-major-scale rewrite;
                    it also unlocks bs>16, where throughput keeps
                    climbing to the bs48 optimum). 0 -> bf16 KV, the
                    bs<=16 low-latency option.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

A100_BASELINE_IMG_S = 8.0   # analytic estimate, see module docstring
TARGET_MULTIPLIER = 3.0

BATCH = int(os.environ.get("AKI_BENCH_BATCH", "48"))
QUANT = os.environ.get("AKI_BENCH_QUANT", "w8a8")
# padded-head flat serving layout (quantize_params_padded): heads own 128
# aligned lanes straight out of the projections — no relayouts around the
# flash kernel, int8 flat-128 KV (forces KV8)
PAD128 = os.environ.get("AKI_BENCH_PAD128", "0") == "1"
KV8 = PAD128 or os.environ.get("AKI_BENCH_KV8", "1") == "1"
TEXT_LEN = 512               # SFT max_length (configs/sft.yaml:21)
DECODE_TOKENS = 32
# 512 + 143 vision + decode room. Only the Pallas flat-128 kernel
# (PAD128) blocks the cache in 128-multiples; both the bf16 path and the
# XLA int8 inline-dequant path read every slot each step, so the tighter
# 704 saves ~8% of the KV stream. (688 = the exact 512+144+32 need was
# probed and is measurement-neutral vs 704 — see PERF.md.)
MAX_LEN = int(os.environ.get(
    "AKI_BENCH_MAXLEN", "768" if PAD128 else "704"
))


def main():
    from aki_tpu.infer.engine import generate, prefill
    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import Policy
    from aki_tpu.models.configs import aki_4b, aki_tiny

    on_tpu = jax.default_backend() == "tpu"
    cfg = aki_4b() if on_tpu else aki_tiny()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: init_aki(k, cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    if QUANT in ("w8", "w8a8", "w4", "w4a8"):
        from aki_tpu.models.quant import (
            quantize_params, quantize_params_padded,
        )

        if PAD128:
            params = jax.jit(
                lambda p: quantize_params_padded(p, cfg.phi3, mode=QUANT)
            )(params)
        else:
            params = jax.jit(
                lambda p: quantize_params(p, mode=QUANT)
            )(params)

    rng = np.random.RandomState(0)
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(BATCH, TEXT_LEN))
    ids[:, 1] = cfg.media_token_id
    ids[:, 40] = cfg.assistant_token_id
    valid = np.ones((BATCH, TEXT_LEN), np.int32)
    s = cfg.siglip.image_size
    imgs = rng.randn(BATCH, s, s, 3).astype(np.float32)
    ids, valid, imgs = jnp.array(ids), jnp.array(valid), jnp.array(imgs)

    run = lambda: generate(
        params, cfg, ids, imgs, valid,
        max_new_tokens=DECODE_TOKENS, max_len=MAX_LEN, policy=policy,
        kv_int8=KV8,
    )
    # params as an ARGUMENT — closing over them bakes 8.6GB of constants
    # into the HLO and compile time explodes
    pf1 = jax.jit(
        lambda p, i, im, v: prefill(
            p, cfg, i[:1], im[:1], v[:1], max_len=MAX_LEN, policy=policy,
            kv_int8=KV8,
        ).last_logits
    )

    # NOTE: on the tunneled axon backend block_until_ready does not block;
    # force completion with a tiny host fetch and amortize over a chain.
    def sync(x):
        return float(jnp.sum(x).astype(jnp.float32))

    # warmup / compile
    sync(run()[0])
    sync(pf1(params, ids, imgs, valid))

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        toks, _ = run()
    sync(toks)
    total = (time.perf_counter() - t0) / n
    img_s = BATCH / total

    # True TTFT percentiles: per-iteration wall time, each iteration forced
    # to completion (includes dispatch + tunnel sync — what a client sees).
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        sync(pf1(params, ids, imgs, valid))
        lat.append((time.perf_counter() - t0) * 1e3)
    p50, p95 = np.percentile(lat, 50), np.percentile(lat, 95)

    # continuous-batching server throughput under mixed arrivals: varied
    # prompt lengths and decode budgets through the slotted engine
    server_img_s = None
    if os.environ.get("AKI_BENCH_SERVER", "1") == "1":
        from aki_tpu.infer.server import ServingEngine

        # free the offline phase's executables + cached output buffers —
        # the engine's slot cache + right-sized admission warmup need the
        # HBM headroom at 4B geometry
        run = pf1 = None
        jax.clear_caches()

        # drain workload: int8 slots (48 fit where bf16 OOMs at 24) +
        # batched admission at the FULL slot count (round-5 chip-busy
        # attribution, exp/server_chipbusy.py ADMITS=32,48 paired at 384
        # requests: admit32-into-48-slots runs cohort-serial at width 32 —
        # 52 decode chunks dispatched vs a ~32-chunk minimum — while
        # admit48 fills every slot: 42 chunks, chip time 20.5 -> 18.8 s,
        # steady-state mid-window 18.4 -> 19.7 img/s, 3/3 pairs. The
        # round-4 "48 is a wash" verdict was an artifact of 96-request
        # ramp-dominated drains. Greedy bs1-2 refill prefills were the
        # original measured throughput killer — decode stalls for a
        # near-bs1-cost prefill every time one slot frees)
        # uint8 ingress (image_uint8=True): clients send resized RGB
        # pixels, normalization runs on device — 4x fewer H2D bytes, and
        # the uploader thread hides the transfer behind decode
        # single prompt bucket: two buckets + windowed shortest-first
        # admission measured WORSE on this drain (12.3 vs 14.0 median —
        # the mixed 256-511 window rarely stays under the 3/4 bucket and
        # long prompts cluster into late, poorly-batched admissions); the
        # engine keeps the feature for genuinely bimodal traffic.
        # compact_tail: ramp + tail decode ticks run at the narrow
        # compiled widths (24/12 at 48 slots) — measured +0.9 img/s on
        # this drain, and round-4's per-tick width rule adds the ramp
        # (completion-aligned admission is the engine default)
        # upload_chunk pinned to 16 EXPLICITLY: the admit-depth A/B that
        # justified admit_batch=32 held UPCHUNK=16 in both arms, and the
        # engine's default (upload_chunk = admit_batch) would silently
        # double it — bigger chunks serialize the upload ramp (48-row
        # chunks measured 18.4 -> 15.8 img/s). Advisor round-4 finding.
        eng = ServingEngine(
            params, cfg, num_slots=BATCH, max_len=MAX_LEN,
            prompt_bucket=TEXT_LEN,
            admit_batch=BATCH, admit_policy="batched",
            kv_int8=KV8, image_uint8=True, policy=policy,
            compact_tail=True, upload_chunk=16,
        )
        n_req = 2 * BATCH
        n_long = 8 * BATCH   # steady-state drain: long enough that the
        #                      ramp + tail stop owning the number
        rng2 = np.random.RandomState(1)
        reqs = []
        for i in range(n_long):
            n = int(rng2.randint(TEXT_LEN // 2, TEXT_LEN))
            rid = rng2.randint(5, cfg.initial_tokenizer_len - 1, size=n)
            rid[1] = cfg.media_token_id
            rid[40 % n] = cfg.assistant_token_id
            reqs.append((rid.tolist(),
                         rng2.randint(0, 256, (s, s, 3)).astype(np.uint8),
                         int(rng2.randint(16, 48))))
        # compile all admission sizes + the decode chunk up front
        eng.warmup()
        # one small UNMEASURED warm drain: the process's first real
        # uploads through the tunnel occasionally crawl (observed an 11 s
        # upload stall in an otherwise 5.3 s drain) — steady-state serving
        # is the quantity under measurement, cold-transport is not
        wh = [eng.submit(r, im, max_new_tokens=m)
              for r, im, m in reqs[: min(16, n_req)]]
        eng.run_until_drained()
        for h in wh:
            h.result(timeout=5)
        # fixed request schedule, 7 independent drains, report the MEDIAN
        # (±20% host-contention variance was mistaken for an engine
        # regression when the driver sampled a single bad run; observed
        # 11.5-16.7 img/s across identical drains)
        drains = []
        for _ in range(7):
            t0 = time.perf_counter()
            handles = [eng.submit(r, im, max_new_tokens=m)
                       for r, im, m in reqs[:n_req]]
            eng.run_until_drained()
            for h in handles:
                h.result(timeout=5)
            drains.append(n_req / (time.perf_counter() - t0))
        server_img_s = float(np.median(drains))
        server_note = "median of 7 drains: " + "/".join(
            f"{d:.1f}" for d in sorted(drains))
        # steady-state rate: one LONG drain, completions 25%..75% by the
        # engine's completion log — a 96-request drain finishes in ~6 s,
        # the same order as a single tunnel stall, so its wall rate mixes
        # cold transport into the engine number (round-4 verdict ask)
        eng.completion_log.clear()
        handles = [eng.submit(r, im, max_new_tokens=m)
                   for r, im, m in reqs]
        eng.run_until_drained()
        for h in handles:
            h.result(timeout=5)
        comp = list(eng.completion_log)
        q1, q3 = n_long // 4, (3 * n_long) // 4
        server_steady = (q3 - q1) / (comp[q3] - comp[q1])
        server_note += (f"; steady-state {server_steady:.1f} img/s "
                        f"(middle half of one {n_long}-request drain)")
        eng.close()
        eng = None

    # measured TRAINING step (fwd + bwd + global-norm clip + AdamW, remat,
    # frozen SigLIP, fp32 master params + bf16 compute) at real AKI-4B
    # widths with the decoder depth truncated — full 32-layer fp32+Adam
    # state is ~41 GB and cannot fit one 16 GB chip; per-layer cost is
    # uniform so ms/step extrapolates linearly. exp/train_bench.py is the
    # standalone harness; thresholds/geometry sweep in PERF.md.
    train_note = None
    if os.environ.get("AKI_BENCH_TRAIN", "1") == "1":
        import dataclasses
        import gc

        from exp.train_bench import flops_per_step
        from aki_tpu.train.optim import make_optimizer
        from aki_tpu.train.step import Batch, TrainState, make_train_step

        params = None
        jax.clear_caches()
        gc.collect()
        depth = int(os.environ.get("AKI_BENCH_TRAIN_DEPTH", "4"))
        tbs = int(os.environ.get("AKI_BENCH_TRAIN_BS", "16"))
        # round-5 train-memory levers (PERF.md): bf16-stored frozen SigLIP
        # (bit-identical compute, no master copy for frozen subtrees) +
        # the dots_nowide remat policy (recompute the two wide MLP dots in
        # the backward instead of saving ~1 GB of (B,T,8192) residuals) +
        # perceiver-layer remat (drops the saved f32 attention logits).
        # Together they move the largest fitting geometry from bs8
        # (109.2 TF/s) to bs16 (116.7 TF/s billed = 73% of ceiling).
        os.environ.setdefault("AKI_REMAT_POLICY", "dots_nowide")
        tcfg = dataclasses.replace(
            cfg, phi3=dataclasses.replace(cfg.phi3, num_layers=depth)
        ) if on_tpu else cfg
        tpol = Policy()   # fp32 params, bf16 compute (amp_bf16 analogue)
        from aki_tpu.train.optim import cast_frozen_to

        p0 = jax.jit(lambda k: init_aki(k, tcfg, dtype=jnp.float32))(
            jax.random.PRNGKey(0))
        p0 = jax.jit(cast_frozen_to)(p0)
        opt = make_optimizer(p0, learning_rate=2e-5, weight_decay=1e-4,
                             grad_clip=1.0)
        tstate = TrainState.create(p0, opt)
        del p0
        step_fn = jax.jit(
            make_train_step(tcfg, opt, policy=tpol, remat=True),
            donate_argnums=(0,),
        )
        t_ids = rng.randint(5, cfg.initial_tokenizer_len - 1,
                            size=(tbs, TEXT_LEN))
        t_ids[:, 1] = cfg.media_token_id
        t_ids[:, 40] = cfg.assistant_token_id
        t_labels = t_ids.copy()
        t_labels[:, :41] = -100
        tbatch = Batch(
            input_ids=jnp.array(t_ids, jnp.int32),
            images=jnp.array(
                rng.randn(tbs, s, s, 3).astype(np.float32)),
            attn_valid=jnp.ones((tbs, TEXT_LEN), jnp.int32),
            labels=jnp.array(t_labels, jnp.int32),
        )
        tstate, metrics = step_fn(tstate, tbatch)   # compile
        float(metrics["loss"])
        nsteps = 10
        t0 = time.perf_counter()
        for _ in range(nsteps):
            tstate, metrics = step_fn(tstate, tbatch)
        float(metrics["loss"])                       # force completion
        dt = (time.perf_counter() - t0) / nsteps
        t_spliced = TEXT_LEN + tcfg.perceiver.num_latents - 1
        fl, _ = flops_per_step(tcfg, tbs, t_spliced)
        tfs = fl / dt / 1e12
        train_note = (
            f"train step (real widths, depth {tcfg.phi3.num_layers}, "
            f"bs{tbs}, remat, fp32+AdamW, frozen vision): "
            f"{dt * 1e3:.0f} ms, {tfs:.1f} TF/s = "
            f"{100 * tfs / 160:.0f}% of the 160 TF/s bf16 ceiling"
        )

    target = A100_BASELINE_IMG_S * TARGET_MULTIPLIER
    print(json.dumps({
        "metric": (
            f"AKI-4B images/sec/chip (bs{BATCH}, {TEXT_LEN}-tok prompt + "
            f"{DECODE_TOKENS}-tok decode, {QUANT} matmuls, "
            f"{'int8' if KV8 else 'bf16'} KV; "
            f"TTFT bs1 p50 = {p50:.1f} ms, p95 = {p95:.1f} ms"
            + (f"; server continuous-batching {server_img_s:.1f} img/s "
               f"mixed arrivals ({server_note})"
               if server_img_s else "")
            + (f"; {train_note}" if train_note else "")
            + ")"
        ),
        "value": round(img_s, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_s / target, 3),
    }))


if __name__ == "__main__":
    main()
