"""RoPE variants at decoder prefill shapes — the ablation says apply_rope
costs ~2.1 ms/layer/side (x32 layers x2 sides = ~134 ms of the 489 ms bs16
prefill). Candidates:

  a. current: f32 rotate-half (lane slice at 48 + concat)
  b. bf16 rotate-half
  c. matmul-R: rotate_half(x) == x @ R with a static (D, D) +-1 permutation
     matrix — MXU instead of lane relayouts
  d. 2D cos/sin (T, D) instead of (B, T, D) — broadcast traffic probe
  e. fold scale*cos/sin once, combined q and k in one call

PYTHONPATH=/root/repo:/root/.axon_site python exp/rope_bench.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.ops.rope import apply_rope

B, T, H, D = 16, 656, 32, 96
LAYERS = 32
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


def scan_bench(name, call, x, cos, sin):
    def run(x, cos, sin):
        def body(c, _):
            o = call(c, cos, sin)
            return (c + 0.001 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, x, None, length=LAYERS)
        return c.reshape(-1)[:8]

    ms = timeit(jax.jit(run), x, cos, sin) / LAYERS
    print(f"{name:56s} {ms:8.3f} ms/call", flush=True)
    return ms


def rot_matrix(d):
    """R with rotate_half(x) == x @ R: R[j, j+d/2] = 1, R[j+d/2, j] = -1."""
    half = d // 2
    r = np.zeros((d, d), np.float32)
    for j in range(half):
        r[half + j, j] = -1.0
        r[j, half + j] = 1.0
    return r


def main():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(B, T, H, D).astype(np.float32), jnp.bfloat16)
    ang = rng.randn(T, D).astype(np.float32)
    cosb = jnp.asarray(np.broadcast_to(np.cos(ang), (B, T, D)))
    sinb = jnp.asarray(np.broadcast_to(np.sin(ang), (B, T, D)))
    cos2, sin2 = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    scan_bench("a. current f32 rotate-half, (B,T,D) tables",
               apply_rope, x, cosb, sinb)

    def rope_bf16(x, cos, sin):
        half = x.shape[-1] // 2
        c = cos[:, :, None, :].astype(x.dtype)
        s = sin[:, :, None, :].astype(x.dtype)
        x1, x2 = x[..., :half], x[..., half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x * c + rot * s

    scan_bench("b. bf16 rotate-half, (B,T,D) tables",
               rope_bf16, x, cosb, sinb)

    R = jnp.asarray(rot_matrix(D), jnp.bfloat16)

    def rope_mm(x, cos, sin):
        c = cos[:, :, None, :].astype(jnp.float32)
        s = sin[:, :, None, :].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        rot = jnp.einsum("bthd,de->bthe", x, R,
                         preferred_element_type=jnp.float32)
        return (x32 * c + rot * s).astype(x.dtype)

    scan_bench("c. matmul-R f32, (B,T,D) tables", rope_mm, x, cosb, sinb)

    def rope_2d(x, cos, sin):
        c = cos[None, :, None, :].astype(jnp.float32)
        s = sin[None, :, None, :].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        half = x.shape[-1] // 2
        x1, x2 = x32[..., :half], x32[..., half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return (x32 * c + rot * s).astype(x.dtype)

    scan_bench("d. f32 rotate-half, (T,D) tables", rope_2d, x, cos2, sin2)

    def rope_mm_2d(x, cos, sin):
        c = cos[None, :, None, :].astype(jnp.float32)
        s = sin[None, :, None, :].astype(jnp.float32)
        rot = jnp.einsum("bthd,de->bthe", x, R,
                         preferred_element_type=jnp.float32)
        return (x.astype(jnp.float32) * c + rot * s).astype(x.dtype)

    scan_bench("e. matmul-R f32, (T,D) tables", rope_mm_2d, x, cos2, sin2)

    # numerics vs current
    ref = np.asarray(apply_rope(x, cosb, sinb).astype(jnp.float32))
    for name, f, c_, s_ in (("b", rope_bf16, cosb, sinb),
                            ("c", rope_mm, cosb, sinb),
                            ("d", rope_2d, cos2, sin2),
                            ("e", rope_mm_2d, cos2, sin2)):
        got = np.asarray(jax.jit(f)(x, c_, s_).astype(jnp.float32))
        print(f"   {name} maxerr vs a: {np.abs(got - ref).max():.5f}",
              flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
