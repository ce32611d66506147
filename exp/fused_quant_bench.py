"""Fused norm/act+quantize Pallas kernels vs the XLA compositions.

Each site measured in-scan (LAYERS iterations, like the real towers), with
the consuming int8 dot included so XLA gets its best fusion shot.

PYTHONPATH=/root/repo:/root/.axon_site python exp/fused_quant_bench.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from aki_tpu.models.common import layernorm, rmsnorm
from aki_tpu.models.quant import quantize_acts
from aki_tpu.ops import fused_quant as fq

N = 6
LAYERS = 27


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


def scan_bench(name, step, x, *ops):
    def run(x, *ops):
        def body(c, _):
            o = step(c, *ops)
            return (c + 0.001 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, x, None, length=LAYERS)
        return c[0, :8]

    ms = timeit(jax.jit(run), x, *ops) / LAYERS
    print(f"{name:52s} {ms:8.3f} ms/call", flush=True)
    return ms


def dot8(q, s, w8, ws):
    y = jax.lax.dot_general(q, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * s * ws).astype(jnp.bfloat16)


def main():
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    for tag, m, d in (("vision ln 16x729x1152", 11664, 1152),
                      ("decoder rms 16x704x3072", 11264, 3072)):
        x = jnp.array(rng.randn(m, d).astype(np.float32), jnp.bfloat16)
        g = jnp.ones((d,), jnp.float32) * 1.1
        b = jnp.zeros((d,), jnp.float32)
        w8 = jax.random.randint(key, (d, d), -127, 127, jnp.int8)
        ws = jnp.ones((1, d), jnp.float32)

        if d == 1152:
            def xla_step(x, g, b, w8, ws):
                h = layernorm({"scale": g, "bias": b}, x, 1e-6)
                q, s = quantize_acts(h)
                return dot8(q, s, w8, ws)

            def fused_step(x, g, b, w8, ws):
                q, s = fq.layernorm_quant(x, g, b, 1e-6)
                return dot8(q, s, w8, ws)
        else:
            def xla_step(x, g, b, w8, ws):
                h = rmsnorm({"scale": g}, x, 1e-5)
                q, s = quantize_acts(h)
                return dot8(q, s, w8, ws)

            def fused_step(x, g, b, w8, ws):
                q, s = fq.rmsnorm_quant(x, g, 1e-5)
                return dot8(q, s, w8, ws)

        t_x = scan_bench(f"{tag} XLA norm+quant+dot", xla_step, x, g, b, w8, ws)
        t_f = scan_bench(f"{tag} fused norm+quant+dot", fused_step, x, g, b,
                         w8, ws)
        # numerics
        qa, sa = (jax.jit(lambda x, g, b: quantize_acts(
            layernorm({"scale": g, "bias": b}, x, 1e-6) if d == 1152
            else rmsnorm({"scale": g}, x, 1e-5)))(x, g, b))
        qf, sf = (jax.jit(lambda x, g, b: fq.layernorm_quant(x, g, b, 1e-6)
                          if d == 1152 else fq.rmsnorm_quant(x, g, 1e-5))(
                              x, g, b))
        mism = int(jnp.sum(qa != qf))
        serr = float(jnp.max(jnp.abs(sa - sf)))
        print(f"  int8 mismatches {mism}/{qa.size}  scale maxerr {serr:.2e}"
              f"  speedup {t_x / t_f:.2f}x", flush=True)

    # decoder MLP: silu(gate)*up -> quant -> w_down dot
    m, inter, d = 11264, 8192, 3072
    gate = jnp.array(rng.randn(m, inter).astype(np.float32) * 0.5,
                     jnp.bfloat16)
    up = jnp.array(rng.randn(m, inter).astype(np.float32), jnp.bfloat16)
    w8 = jax.random.randint(key, (inter, d), -127, 127, jnp.int8)
    ws = jnp.ones((1, d), jnp.float32)

    def xla_silu(gate, up, w8, ws):
        h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        q, s = quantize_acts(h)
        return dot8(q, s, w8, ws)

    def fused_silu(gate, up, w8, ws):
        q, s = fq.silu_mul_quant(gate, up)
        return dot8(q, s, w8, ws)

    def step_x(c, up, w8, ws):
        return xla_silu(c, up, w8, ws) @ jnp.ones((d, inter), jnp.bfloat16)
    def step_f(c, up, w8, ws):
        return fused_silu(c, up, w8, ws) @ jnp.ones((d, inter), jnp.bfloat16)

    t_x = scan_bench("decoder silu*up 11264x8192 XLA", step_x, gate, up, w8, ws)
    t_f = scan_bench("decoder silu*up 11264x8192 fused", step_f, gate, up,
                     w8, ws)
    qa, sa = jax.jit(lambda g, u: quantize_acts(
        jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u))(gate, up)
    qf, sf = jax.jit(fq.silu_mul_quant)(gate, up)
    mism = int(jnp.sum(qa != qf))
    print(f"  int8 mismatches {mism}/{qa.size}  speedup {t_x / t_f:.2f}x",
          flush=True)

    # vision MLP: gelu(fc1out + b) -> quant -> fc2 dot (cols padded to 4352)
    m, inter, d = 11664, 4352, 1152
    x = jnp.array(rng.randn(m, inter).astype(np.float32), jnp.bfloat16)
    bias = jnp.array(rng.randn(inter).astype(np.float32) * 0.1, jnp.float32)
    w8 = jax.random.randint(key, (inter, d), -127, 127, jnp.int8)
    ws = jnp.ones((1, d), jnp.float32)

    def xla_gelu(x, bias, w8, ws):
        h = jax.nn.gelu((x + bias).astype(jnp.float32),
                        approximate=True).astype(x.dtype)
        q, s = quantize_acts(h)
        return dot8(q, s, w8, ws)

    def fused_gelu(x, bias, w8, ws):
        q, s = fq.gelu_quant(x, bias)
        return dot8(q, s, w8, ws)

    def gstep_x(c, bias, w8, ws):
        return xla_gelu(c, bias, w8, ws) @ jnp.ones((d, inter), jnp.bfloat16)
    def gstep_f(c, bias, w8, ws):
        return fused_gelu(c, bias, w8, ws) @ jnp.ones((d, inter), jnp.bfloat16)

    t_x = scan_bench("vision gelu 11664x4352 XLA", gstep_x, x, bias, w8, ws)
    t_f = scan_bench("vision gelu 11664x4352 fused", gstep_f, x, bias, w8, ws)
    qa, sa = jax.jit(lambda x, b: quantize_acts(jax.nn.gelu(
        (x + b).astype(jnp.float32), approximate=True).astype(x.dtype)))(
            x, bias)
    qf, sf = jax.jit(fq.gelu_quant)(x, bias)
    mism = int(jnp.sum(qa != qf))
    print(f"  int8 mismatches {mism}/{qa.size}  speedup {t_x / t_f:.2f}x",
          flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
