"""Decode chunk cost: dispatch overhead vs device compute, server-pattern
vs pipelined dispatches.

PYTHONPATH=/root/repo:/root/.axon_site python exp/decode_cost.py
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

BATCH, TEXT_LEN, MAX_LEN = 16, 512, 704


def main():
    cfg = aki_4b()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: init_aki(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = jax.jit(lambda p: quantize_params(p, mode="w8a8"))(params)

    eng = ServingEngine(params, cfg, num_slots=BATCH, max_len=MAX_LEN,
                        prompt_bucket=TEXT_LEN, admit_batch=1, policy=policy)
    # minimal warmup: decode only
    eng._rng, sub = jax.random.split(eng._rng)
    st, toks = eng._get_decode(8)(eng.params, eng.state,
                           jnp.zeros((BATCH,), bool), sub)
    eng.state = st
    np.asarray(toks)

    active = jnp.ones((BATCH,), bool)

    # 1) no-op jit with the params tree as an argument: pure dispatch cost
    nop = jax.jit(lambda p, x: x + 1.0)
    x = jnp.zeros(())
    float(nop(params, x))
    t0 = time.perf_counter()
    for _ in range(20):
        x = nop(params, x)
    float(x)
    print(f"no-op jit(params, x) dispatch: "
          f"{(time.perf_counter() - t0) / 20 * 1e3:7.2f} ms/call", flush=True)

    # 2) server pattern: dispatch chunk -> fetch toks, 12 times
    t0 = time.perf_counter()
    n_steps = 0
    for _ in range(12):
        eng._rng, sub = jax.random.split(eng._rng)
        eng.state, toks = eng._get_decode(8)(eng.params, eng.state, active, sub)
        np.asarray(toks)
        n_steps += eng.decode_chunk
    per = (time.perf_counter() - t0) / n_steps * 1e3
    print(f"server pattern (fetch per chunk):  {per:7.2f} ms/step", flush=True)

    # 3) pipelined: dispatch all 12 chunks, one final fetch
    t0 = time.perf_counter()
    n_steps = 0
    last = None
    for _ in range(12):
        eng._rng, sub = jax.random.split(eng._rng)
        eng.state, last = eng._get_decode(8)(eng.params, eng.state, active, sub)
        n_steps += eng.decode_chunk
    np.asarray(last)
    per = (time.perf_counter() - t0) / n_steps * 1e3
    print(f"pipelined (one final fetch):       {per:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
