"""Prefill vs decode split for serving modes: bf16-KV, int8-KV, padded-128.

PYTHONPATH=/root/repo:/root/.axon_site python exp/mode_split.py
"""
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
from aki_tpu.models.quant import quantize_params, quantize_params_padded

import os

B = int(os.environ.get("B", "16"))
T, DEC = 512, 32


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

    rng = np.random.RandomState(0)
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(B, T))
    ids[:, 1] = cfg.media_token_id
    ids[:, 40] = cfg.assistant_token_id
    valid = np.ones((B, T), np.int32)
    s = cfg.siglip.image_size
    imgs = rng.randn(B, s, s, 3).astype(np.float32)
    ids, valid, imgs = jnp.array(ids), jnp.array(valid), jnp.array(imgs)

    modes = os.environ.get("MODES", "bf16kv,kv8,pad128").split(",")
    for mode in modes:
        if mode == "bf16kv":
            qfn = lambda p: quantize_params(p, mode="w8a8")
            kv8, max_len = False, 704
        elif mode == "kv8":
            qfn = lambda p: quantize_params(p, mode="w8a8")
            # the XLA decode path has no 128-multiple cache requirement;
            # 704 saves ~9% of the KV stream vs 768
            kv8, max_len = True, 704
        else:
            qfn = lambda p: quantize_params_padded(p, cfg.phi3, mode="w8a8")
            kv8, max_len = True, 768
        max_len = int(os.environ.get("MAXLEN", str(max_len)))
        params = jax.jit(
            lambda k: qfn(init_aki(k, cfg, dtype=jnp.bfloat16))
        )(jax.random.PRNGKey(0))

        pf = jax.jit(lambda p, i, im, v: prefill(
            p, cfg, i, im, v, max_len=max_len, policy=policy, kv_int8=kv8
        ).last_logits)
        gen = lambda: generate(params, cfg, ids, imgs, valid,
                               max_new_tokens=DEC, max_len=max_len,
                               policy=policy, kv_int8=kv8)[0]
        ms_pf = timeit(lambda: pf(params, ids, imgs, valid))
        ms_all = timeit(gen)
        dec = (ms_all - ms_pf) / DEC
        print(f"{mode:8s}: prefill16 {ms_pf:7.1f} ms | e2e {ms_all:7.1f} ms "
              f"| decode {dec:5.2f} ms/step | {B / (ms_all / 1e3):5.2f} img/s",
              flush=True)
        pf = gen = params = None
        jax.clear_caches()


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
