"""Offline throughput under per-jit TPU compiler options.

Client-side XLA_FLAGS cannot carry TPU compiler flags through the
tunneled axon plugin (fatal unknown-flag on the CPU-client parser), but
AOT `lower().compile(compiler_options=...)` ships options to the
server-side compiler. Probes the bench offline phase (bs48 W8A8 +
int8 KV) under candidate scheduling/VMEM options.

PYTHONPATH=/root/repo:/root/.axon_site python exp/compiler_opts_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import generate
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import Policy
from aki_tpu.models.configs import aki_4b
from aki_tpu.models.quant import quantize_params

BATCH, TEXT_LEN, MAX_LEN, DECODE = 48, 512, 704, 32

OPTS = [
    None,
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_tpu_enable_dot_strength_reduction": "false"},
]


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    cfg = aki_4b()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: quantize_params(
        init_aki(k, cfg, dtype=jnp.bfloat16), mode="w8a8"
    ))(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1,
                      size=(BATCH, TEXT_LEN))
    ids[:, 1] = cfg.media_token_id
    ids[:, 40] = cfg.assistant_token_id
    valid = np.ones((BATCH, TEXT_LEN), np.int32)
    s = cfg.siglip.image_size
    imgs = rng.randn(BATCH, s, s, 3).astype(np.float32)
    ids, valid, imgs = jnp.array(ids), jnp.array(valid), jnp.array(imgs)

    kw = dict(max_new_tokens=DECODE, max_len=MAX_LEN, policy=policy,
              kv_int8=True)
    lowered = generate.lower(params, cfg, ids, imgs, valid, **kw)
    for opts in OPTS:
        try:
            ex = lowered.compile(compiler_options=opts)
        except Exception as e:  # noqa: BLE001 — probe must report and go on
            print(f"{opts}: compile FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        run = lambda: ex(params, ids, imgs, valid)
        sync(run()[0])
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            toks, _ = run()
        sync(toks)
        total = (time.perf_counter() - t0) / n
        print(f"{opts}: {BATCH / total:6.2f} img/s "
              f"({total * 1e3:7.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
