"""Vision attention: standard kernel (pad+transpose around pallas) vs the
flat padded-head kernel (no relayouts), in-scan at SigLIP shapes.

Vision has NO KV cache, so padding heads 72 -> 128 inside the projection
weights costs only the wider matmuls — unlike the decoder, where the
flat-128 cache inflates decode reads by 33%.

PYTHONPATH=/root/repo:/root/.axon_site python exp/vision_flat.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops.flash_mma import flash_mma_attention, flash_mma_attention_flat

B, T, H, D, DP = 16, 729, 16, 72, 128
LAYERS = 27
N = 6


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, *args, n=N):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def scan_bench(name, make_call, q, k, v):
    def run(q, k, v):
        def body(c, _):
            o = make_call(c, k, v)
            return (c + 0.001 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, q, None, length=LAYERS)
        return c.reshape(-1)[:8]

    ms = timeit(jax.jit(run), q, k, v) / LAYERS
    print(f"{name:56s} {ms:8.3f} ms/call", flush=True)


def main():
    rng = np.random.RandomState(0)

    q4 = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    k4 = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    v4 = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)

    scan_bench("standard kernel (B,T,16,72) plain",
               lambda q, k, v: flash_mma_attention(q, k, v, causal=False),
               q4, k4, v4)

    # flat padded operands: heads at 128-lane blocks, tail-padded
    def to_flat(x):
        out = np.zeros((B, T, H, DP), np.float32)
        out[..., :D] = np.asarray(x, np.float32)
        return jnp.asarray(out.reshape(B, T, H * DP), jnp.bfloat16)

    qf, kf, vf = to_flat(q4), to_flat(k4), to_flat(v4)
    ones = jnp.ones((B, T), jnp.int32)

    scan_bench("flat kernel (B,T,2048) masked kv_valid",
               lambda q, k, v: flash_mma_attention_flat(
                   q, k, v, num_heads=H, head_dim=D, causal=False,
                   kv_valid=ones),
               qf, kf, vf)

    # correctness vs the standard kernel
    o_std = flash_mma_attention(q4, k4, v4, causal=False)
    o_flat = flash_mma_attention_flat(qf, kf, vf, num_heads=H, head_dim=D,
                                      causal=False, kv_valid=ones)
    o_flat4 = o_flat.reshape(B, T, H, DP)[..., :D]
    err = float(jnp.max(jnp.abs(
        (o_std - o_flat4).astype(jnp.float32))))
    print(f"flat vs standard maxerr: {err:.4f}", flush=True)

    # extra matmul cost of the padding: qkv cols 1152 -> 2048, wo rows
    M, din = B * T, H * D
    x8 = jax.random.randint(jax.random.PRNGKey(0), (M, din), -127, 127,
                            jnp.int8)
    for cols in (din, H * DP):
        w8 = jax.random.randint(jax.random.PRNGKey(1), (LAYERS, 4, din, cols),
                                -127, 127, jnp.int8)

        @jax.jit
        def dots(x8, w8):
            def body(c, wl):
                for i in range(4):
                    y = jax.lax.dot_general(
                        c, wl[i], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    c = jnp.clip(y[:, :din] >> 8, -127, 127).astype(jnp.int8)
                return c, None

            c, _ = jax.lax.scan(body, x8, w8)
            return c

        ms = timeit(lambda: dots(x8, w8)) / LAYERS
        print(f"4x int8 proj dots cols={cols:5d}: {ms:8.3f} ms/layer",
              flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    if "--xla" not in sys.argv:
        main()


def xla_variants():
    """Non-causal XLA attention at vision shapes, in-scan."""
    rng = np.random.RandomState(0)
    q4 = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    k4 = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    v4 = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)

    def xla_attn(q, k, v):
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhts,bshd->bthd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def xla_attn_bf16s(q, k, v):
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) * (D ** -0.5)
        m = jnp.max(s, -1, keepdims=True)
        p = jnp.exp((s - m)).astype(jnp.bfloat16)
        l = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
        o = jnp.einsum("bhts,bshd->bthd", p, v,
                       preferred_element_type=jnp.float32)
        return (o / l.transpose(0, 2, 1, 3)).astype(q.dtype)

    scan_bench("xla einsum attention (f32 softmax)", xla_attn, q4, k4, v4)
    scan_bench("xla einsum attention (bf16 probs)", xla_attn_bf16s,
               q4, k4, v4)
    from aki_tpu.ops.flash_mma import flash_mma_attention
    o_f = flash_mma_attention(q4, k4, v4, causal=False)
    o_x = xla_attn(q4, k4, v4)
    print("xla vs flash maxerr:",
          float(jnp.max(jnp.abs((o_f - o_x).astype(jnp.float32)))),
          flush=True)


if __name__ == "__main__" and "--xla" in sys.argv:
    xla_variants()
