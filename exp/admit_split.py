"""Admission cost split: batched prefill vs slot-cache insert scatter.

The admission path runs `_prefill_batch` (temp 16-row GenState, cache
zero-init + DUS writes) then `_insert` (scatter all rows into the
48-slot cache: ~4.4 GB read + 4.4 GB write at int8-KV 4B geometry).
If the insert is a material slice of the ~576 ms bs16 admission, fusing
prefill writes directly into the (donated) slot cache would recover it.

PYTHONPATH=/root/repo:/root/.axon_site python exp/admit_split.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.server import ServingEngine
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import Policy
from aki_tpu.models.configs import aki_4b
from aki_tpu.models.quant import quantize_params

SLOTS, ADMIT, TEXT_LEN, MAX_LEN = 48, 16, 512, 704


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    cfg = aki_4b()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: quantize_params(
        init_aki(k, cfg, dtype=jnp.bfloat16), mode="w8a8"
    ))(jax.random.PRNGKey(0))
    eng = ServingEngine(
        params, cfg, num_slots=SLOTS, max_len=MAX_LEN,
        prompt_bucket=TEXT_LEN, admit_batch=ADMIT, admit_policy="batched",
        kv_int8=True, image_uint8=True, policy=policy,
    )
    rng = np.random.RandomState(0)
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1,
                      size=(ADMIT, TEXT_LEN)).astype(np.int32)
    ids[:, 1] = cfg.media_token_id
    ids[:, 40] = cfg.assistant_token_id
    valid = np.ones((ADMIT, TEXT_LEN), np.int32)
    s = cfg.siglip.image_size
    imgs = jnp.array(rng.randint(0, 256, (ADMIT, s, s, 3)), jnp.uint8)
    ids, valid = jnp.array(ids), jnp.array(valid)
    slot_idx = jnp.arange(ADMIT, dtype=jnp.int32)

    # split-path oracle: batch-sized prefill + insert scatter (the
    # pre-fusion admission; production now runs the fused path)
    from aki_tpu.infer.engine import prefill

    split_pf = jax.jit(lambda p, i, im, v: prefill(
        p, eng.cfg, i, im.astype(jnp.float32) / 127.5 - 1.0, v,
        max_len=MAX_LEN, policy=policy, kv_int8=True,
    ))

    # compile all three
    new = split_pf(params, ids, imgs, valid)
    eng.state = eng._insert(eng.state, new, slot_idx)
    sync(eng.state.lengths)

    n = 6
    # per-iter sync: un-synced prefills queue N temp GenStates (OOM);
    # the ~50 ms round trip inflates a ~550 ms call ~10% — acceptable
    # for a coarse split
    del new  # two live 16-row temp states OOM a 16 GB chip at 48 slots
    t0 = time.perf_counter()
    for _ in range(n):
        new = split_pf(params, ids, imgs, valid)
        sync(new.lengths)
        del new
    new = split_pf(params, ids, imgs, valid)
    sync(new.lengths)
    t_pf = (time.perf_counter() - t0) / n

    # inserts chain in place (donated state), sync once
    t0 = time.perf_counter()
    for _ in range(n):
        eng.state = eng._insert(eng.state, new, slot_idx)
    sync(eng.state.lengths)
    t_ins = (time.perf_counter() - t0) / n

    # end-to-end both (what _admit_many pays)
    del new
    t0 = time.perf_counter()
    for _ in range(n):
        new = split_pf(params, ids, imgs, valid)
        eng.state = eng._insert(eng.state, new, slot_idx)
        del new
        sync(eng.state.lengths)
    t_both = (time.perf_counter() - t0) / n

    # fused path: prefill writes straight into the donated slot cache
    fused = eng._prefill_batch
    eng.state = fused(params, ids, imgs, valid, eng.state, slot_idx)
    sync(eng.state.lengths)
    t0 = time.perf_counter()
    for _ in range(n):
        eng.state = fused(params, ids, imgs, valid, eng.state, slot_idx)
        sync(eng.state.lengths)
    t_fused = (time.perf_counter() - t0) / n

    print(f"prefill bs{ADMIT}: {t_pf * 1e3:7.1f} ms "
          f"({t_pf * 1e3 / ADMIT:5.1f} ms/img)", flush=True)
    print(f"insert:          {t_ins * 1e3:7.1f} ms", flush=True)
    print(f"split both:      {t_both * 1e3:7.1f} ms", flush=True)
    print(f"fused:           {t_fused * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
