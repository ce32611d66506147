"""Profile one server drain: where does the wall time go?

PYTHONPATH=/root/repo:/root/.axon_site python exp/server_profile.py
Env: POLICY=greedy|batched ADMIT=4|8 SLOTS=16
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

BATCH = 16
TEXT_LEN = 512
MAX_LEN = 704
POLICY = os.environ.get("POLICY", "greedy")
CHUNK = int(os.environ.get("CHUNK", "8"))
BUCKETS = os.environ.get("BUCKETS", "")
ADMIT = int(os.environ.get("ADMIT", "4"))
SLOTS = int(os.environ.get("SLOTS", str(BATCH)))


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = aki_4b() if on_tpu else aki_tiny()
    policy = Policy(param_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: init_aki(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = jax.jit(lambda p: quantize_params(p, mode="w8a8"))(params)

    eng = ServingEngine(
        params, cfg, num_slots=SLOTS, max_len=MAX_LEN,
        prompt_bucket=TEXT_LEN, admit_batch=ADMIT, policy=policy,
        admit_policy=POLICY, decode_chunk=CHUNK,
        prompt_buckets=tuple(int(x) for x in BUCKETS.split(',')) if BUCKETS else None,
    )

    # instrument
    times = {"admit_prep": 0.0, "admit_dispatch": 0.0, "decode_dispatch": 0.0,
             "toks_fetch": 0.0, "bookkeep": 0.0}
    counts = {"prefills": {}, "chunks": 0, "img_upload_mb": 0.0}

    orig_admit = eng._admit_many

    def admit_many(slots, reqs):
        t0 = time.perf_counter()
        b = 1
        while b < len(reqs):
            b *= 2
        b = min(b, eng.admit_batch)
        counts["prefills"][b] = counts["prefills"].get(b, 0) + 1
        counts["img_upload_mb"] += b * 384 * 384 * 3 * 4 / 1e6
        orig_admit(slots, reqs)
        times["admit_dispatch"] += time.perf_counter() - t0

    eng._admit_many = admit_many

    orig_get = eng._get_decode

    def get_decode(n):
        fn = orig_get(n)

        def decode(params_, state, active, key):
            t0 = time.perf_counter()
            out = fn(params_, state, active, key)
            times["decode_dispatch"] += time.perf_counter() - t0
            counts["chunks"] += 1
            counts.setdefault("chunk_lens", {}).setdefault(n, 0)
            counts["chunk_lens"][n] += 1
            return out

        return decode

    eng._get_decode = get_decode

    import aki_tpu.infer.server as srv
    orig_asarray = np.asarray

    eng.warmup()

    rng2 = np.random.RandomState(1)
    reqs = []
    n_req = 2 * BATCH
    imgs = rng2.randn(BATCH, cfg.siglip.image_size, cfg.siglip.image_size,
                      3).astype(np.float32)
    for i in range(n_req):
        n = int(rng2.randint(TEXT_LEN // 2, TEXT_LEN))
        rid = rng2.randint(5, cfg.initial_tokenizer_len - 1, size=n)
        rid[1] = cfg.media_token_id
        rid[40 % n] = cfg.assistant_token_id
        reqs.append((rid.tolist(), imgs[i % BATCH], int(rng2.randint(16, 48))))

    t0 = time.perf_counter()
    handles = [eng.submit(r, im, max_new_tokens=m) for r, im, m in reqs]

    # patched step loop with fetch timing
    steps = eng.run_until_drained()
    for h in handles:
        h.result(timeout=5)
    total = time.perf_counter() - t0

    print(f"policy={POLICY} admit={ADMIT} slots={SLOTS} chunk={CHUNK} buckets={BUCKETS or TEXT_LEN}")
    print(f"total drain: {total:.2f}s -> {n_req / total:.2f} img/s")
    lens = counts.get("chunk_lens", {})
    print(f"engine steps: {steps}, decode chunks: {counts['chunks']} "
          f"({sum(k * v for k, v in lens.items())} decode steps, "
          f"lens={lens})")
    print(f"prefill calls by batch: {counts['prefills']} "
          f"(img upload {counts['img_upload_mb']:.0f} MB)")
    print(f"admit wall (prep+dispatch): {times['admit_dispatch']:.2f}s")
    print(f"decode dispatch wall: {times['decode_dispatch']:.2f}s")
    # residual = toks fetch + bookkeeping inside step()
    print(f"residual (fetch+bookkeep): "
          f"{total - times['admit_dispatch'] - times['decode_dispatch']:.2f}s")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
