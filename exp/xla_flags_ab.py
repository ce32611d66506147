"""Offline throughput under alternative XLA TPU flag settings.

PERF.md's remaining offline lever is "in-situ int8 MXU 300 -> 340+ TOPS
(XLA-internal scheduling)". This measures the end-to-end bs48 offline
number (the bench offline phase: prefill 512+144 + 32 decode steps,
W8A8 + int8 KV) under a given XLA_FLAGS value — run once per flag
setting, compare img/s:

  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
    PYTHONPATH=/root/repo:/root/.axon_site python exp/xla_flags_ab.py
"""
import os
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

    run = lambda: generate(
        params, cfg, ids, imgs, valid, max_new_tokens=DECODE,
        max_len=MAX_LEN, policy=policy, kv_int8=True,
    )
    sync(run()[0])
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        toks, _ = run()
    sync(toks)
    total = (time.perf_counter() - t0) / n
    print(f"XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r}: "
          f"{BATCH / total:6.2f} img/s ({total * 1e3:7.1f} ms/batch)",
          flush=True)


if __name__ == "__main__":
    main()
