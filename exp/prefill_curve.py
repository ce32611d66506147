"""Prefill+vision cost vs batch size and prompt bucket — admission sizing.

PYTHONPATH=/root/repo:/root/.axon_site python exp/prefill_curve.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.infer.engine import prefill
from aki_tpu.models.aki import init_aki
from aki_tpu.models.common import Policy
from aki_tpu.models.configs import aki_4b
from aki_tpu.models.quant import quantize_params

MAX_LEN = 704


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    cfg = aki_4b()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: init_aki(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = jax.jit(lambda p: quantize_params(p, mode="w8a8"))(params)

    rng = np.random.RandomState(0)
    s = cfg.siglip.image_size

    for t in (512, 256):
        for b in (1, 2, 4, 8, 16):
            ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(b, t))
            ids[:, 1] = cfg.media_token_id
            ids[:, 40] = cfg.assistant_token_id
            valid = np.ones((b, t), np.int32)
            imgs = rng.randn(b, s, s, 3).astype(np.float32)
            ids, valid, imgs = jnp.array(ids), jnp.array(valid), jnp.array(imgs)

            f = jax.jit(
                lambda p, i, im, v: prefill(
                    p, cfg, i, im, v, max_len=MAX_LEN, policy=policy
                ).last_logits
            )
            sync(f(params, ids, imgs, valid))
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                r = f(params, ids, imgs, valid)
            sync(r)
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"bucket={t:4d} bs={b:2d}: {ms:7.1f} ms "
                  f"({ms / b:6.1f} ms/req)", flush=True)
            f = None
            jax.clear_caches()


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
