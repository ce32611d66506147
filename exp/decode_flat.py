"""Isolate decode-step cost: full decoder step + attention-only, for
bf16-KV dense vs int8-KV F=3072 (d=96) vs int8-KV F=4096 (padded d=128).

PYTHONPATH=/root/repo:/root/.axon_site python exp/decode_flat.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops import decode_attention as da
from aki_tpu.ops.attention import dense_attention

B, S, L = 16, 768, 32
STEPS = 32


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def scan_bench(name, op, q0, n=4):
    """op(q) -> (b,1,h,d); chained over STEPS*L calls (layers x steps)."""

    def run(q):
        def body(c, _):
            y = op(c)
            return c + 0.001 * y, None
        c, _ = jax.lax.scan(body, q, None, length=STEPS * L)
        return jnp.ravel(c)[:8]

    f = jax.jit(run)
    r = f(q0)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(q0)
    sync(r)
    per_layer = (time.perf_counter() - t0) / n / (STEPS * L) * 1e3
    print(f"{name:46s} {per_layer:7.3f} ms/layer-step "
          f"({per_layer * L:6.2f} ms/step)", flush=True)


def main():
    rng = np.random.RandomState(0)
    lengths = jnp.asarray(rng.randint(600, 700, size=(B,)), jnp.int32)

    for h, d in ((32, 96), (32, 128)):
        f = h * d
        q = jnp.asarray(rng.randn(B, 1, h, d), jnp.bfloat16)
        k8 = jnp.asarray(
            rng.randint(-127, 127, size=(1, B, S, f)), jnp.int8)
        v8 = jnp.asarray(
            rng.randint(-127, 127, size=(1, B, S, f)), jnp.int8)
        ks = jnp.asarray(np.abs(rng.randn(1, B, h, S)) * 0.01, jnp.float32)
        vs = jnp.asarray(np.abs(rng.randn(1, B, h, S)) * 0.01, jnp.float32)
        li = jnp.zeros((), jnp.int32)
        scan_bench(
            f"int8 flat XLA decode attn F={f} d={d}",
            lambda qq: da.decode_attention_flat_xla(
                qq, k8, ks, v8, vs, lengths, li, scale=96 ** -0.5),
            q,
        )

    # bf16 dense decode attention reference (d=96, 704 slots)
    kb = jnp.asarray(rng.randn(B, 704, 32, 96), jnp.bfloat16)
    vb = jnp.asarray(rng.randn(B, 704, 32, 96), jnp.bfloat16)
    kv_valid = (jnp.arange(704)[None] < lengths[:, None]).astype(jnp.int32)
    qb = jnp.asarray(rng.randn(B, 1, 32, 96), jnp.bfloat16)
    scan_bench(
        "bf16 dense decode attn (704 slots)",
        lambda qq: dense_attention(qq, kb, vb, kv_valid=kv_valid,
                                   q_offset=lengths - 1),
        qb,
    )


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
