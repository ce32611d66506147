"""Prefill/decode split for the kv8 serving path at a given batch.

PYTHONPATH=/root/repo:/root/.axon_site B=48 python exp/split_kv8.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import generate, prefill
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import Policy
from aki_tpu.models.configs import aki_4b
from aki_tpu.models.quant import quantize_params

B = int(os.environ.get("B", "48"))
T, DEC, MAX_LEN = 512, 32, 704


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, n=4):
    r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = aki_4b()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: init_aki(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = jax.jit(lambda p: quantize_params(p, mode="w8a8"))(params)

    rng = np.random.RandomState(0)
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(B, T))
    ids[:, 1] = cfg.media_token_id
    valid = np.ones((B, T), np.int32)
    s = cfg.siglip.image_size
    imgs = rng.randn(B, s, s, 3).astype(np.float32)
    ids, valid, imgs = jnp.array(ids), jnp.array(valid), jnp.array(imgs)

    pf = jax.jit(lambda p, i, im, v: prefill(
        p, cfg, i, im, v, max_len=MAX_LEN, policy=policy,
        kv_int8=True).last_logits)
    ms_pf = timeit(lambda: pf(params, ids, imgs, valid))
    print(f"bs{B} prefill(+vision): {ms_pf:7.1f} ms", flush=True)

    for dec in (1, DEC):
        run = lambda: generate(params, cfg, ids, imgs, valid,
                               max_new_tokens=dec, max_len=MAX_LEN,
                               policy=policy, kv_int8=True)[0]
        ms = timeit(run)
        print(f"bs{B} generate({dec:2d} tok): {ms:7.1f} ms", flush=True)

    # (gen(32) - gen(1)) / 31 = marginal decode step
    print("done", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
