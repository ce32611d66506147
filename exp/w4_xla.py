"""Packed-int4 WEIGHTS through XLA inline-dequant decode matmuls — does the
kv4 double-read verdict transfer to the weight stream? (VERDICT r4 #6's one
cheap un-run probe: weights ≠ cache layout, so the two-dot argument needs
its own measurement.)

Decode matmuls at bs48 stream ~3.7 GB of int8 weights per step (~11 ms at
the 327 GB/s XLA ceiling — the dominant decode term after the KV read).
int4 packing halves the bytes IF the nibble unpack fuses into the dot's
operand read. Candidate forms, same as exp/kv4_xla*.py:

- int8 baseline:      y = x @ q8.astype(bf16)          (reads h*inter B)
- two-dot split-half: columns deinterleaved so byte j packs (lo=col j,
  hi=col j+inter/2); y = concat(x @ lo(P), x @ hi(P)).  Each dot reads the
  FULL packed array (h*inter/2 B) -> net traffic h*inter B == int8, unless
  XLA CSEs the two reads into one pass (it did NOT for the KV cache).
- one-dot row-pack:   byte (i,j) packs (lo=W[2i,j], hi=W[2i+1,j]);
  y = x_even @ lo(P) + x_odd @ hi(P).  Still two full reads of P.
- materialized unpack: one dot over the unpacked (h, inter) int8 — XLA
  materializes the unpacked tensor (the kv4 loss mode).

Timing per CLAUDE.md: >= 24 independent layer matmuls per jit call, one
scalar slice fetched (block_until_ready does not block through the
tunnel); dims mirror the AKI-4B decode hot matmul (h=3072 -> inter=8192,
M=48 rows).

PYTHONPATH=/root/repo:/root/.axon_site python exp/w4_xla.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

M = int(os.environ.get("M", "48"))
H = int(os.environ.get("H", "3072"))
INTER = int(os.environ.get("INTER", "8192"))
LAYERS = int(os.environ.get("LAYERS", "24"))
REPS = int(os.environ.get("REPS", "5"))
# scan-repeat the full layer pass inside the jit: one (M,H)x(H,INTER)
# int8 read is only ~0.08 ms at the 327 GB/s ceiling, so a single
# 24-layer pass (~2 ms device) hides under the ~25 ms tunnel dispatch;
# INNER passes make the device time dominate (first probe mismeasured
# the int8 baseline at 23 GB/s for exactly this reason)
INNER = int(os.environ.get("INNER", "16"))


def pack_cols(q4):  # (L, H, INTER) int8 in [-8,7] -> (L, H, INTER//2) uint8
    lo = q4[..., : INTER // 2]
    hi = q4[..., INTER // 2:]
    return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.uint8)


def pack_rows(q4):  # byte (i, j) packs rows (2i, 2i+1)
    lo = q4[:, 0::2, :]
    hi = q4[:, 1::2, :]
    return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.uint8)


def unpack_lo(p):   # arithmetic-shift sign extension, stays int8
    return (p.astype(jnp.int8) << 4) >> 4


def unpack_hi(p):
    return p.astype(jnp.int8) >> 4


def time_fn(fn, *args):
    out = fn(*args)
    float(np.asarray(out)[0])
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / (LAYERS * INNER) * 1e3


def scanned(layer_pass):
    """jit(scan(full-layer-pass, length=INNER)) — device time dominates
    the tunnel dispatch."""

    def run(x, w):
        def body(acc, _):
            return acc + layer_pass(x, w), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((M,), jnp.float32), None, length=INNER)
        return acc

    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    q4 = jax.random.randint(key, (LAYERS, H, INTER), -8, 8, jnp.int8)
    q8 = jax.random.randint(key, (LAYERS, H, INTER), -127, 128, jnp.int8)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, H), jnp.bfloat16)
    pc = jax.jit(pack_cols)(q4)
    pr = jax.jit(pack_rows)(q4)

    def _base(x, q8):
        acc = jnp.zeros((M,), jnp.float32)
        for li in range(LAYERS):
            y = x @ q8[li].astype(jnp.bfloat16)
            acc += y[:, 0].astype(jnp.float32)
        return acc

    def _two_dot(x, pc):
        acc = jnp.zeros((M,), jnp.float32)
        for li in range(LAYERS):
            ylo = x @ unpack_lo(pc[li]).astype(jnp.bfloat16)
            yhi = x @ unpack_hi(pc[li]).astype(jnp.bfloat16)
            acc += ylo[:, 0].astype(jnp.float32) + yhi[:, 0].astype(jnp.float32)
        return acc

    def _row_pack(x, pr):
        xe, xo = x[:, 0::2], x[:, 1::2]
        acc = jnp.zeros((M,), jnp.float32)
        for li in range(LAYERS):
            y = (xe @ unpack_lo(pr[li]).astype(jnp.bfloat16)
                 + xo @ unpack_hi(pr[li]).astype(jnp.bfloat16))
            acc += y[:, 0].astype(jnp.float32)
        return acc

    def _materialized(x, pc):
        acc = jnp.zeros((M,), jnp.float32)
        for li in range(LAYERS):
            w = jnp.concatenate(
                [unpack_lo(pc[li]), unpack_hi(pc[li])], axis=-1)
            y = x @ w.astype(jnp.bfloat16)
            acc += y[:, 0].astype(jnp.float32)
        return acc

    base_int8 = scanned(_base)
    two_dot = scanned(_two_dot)
    row_pack = scanned(_row_pack)
    materialized = scanned(_materialized)

    byte8 = H * INTER
    byte4 = byte8 // 2
    for name, fn, args, nbytes in [
        ("int8 baseline ", base_int8, (x, q8), byte8),
        ("int4 two-dot  ", two_dot, (x, pc), byte4),
        ("int4 row-pack ", row_pack, (x, pr), byte4),
        ("int4 material.", materialized, (x, pc), byte4),
    ]:
        ms = time_fn(fn, *args)
        print(f"{name}: {ms:7.3f} ms/layer  "
              f"eff-bw(packed bytes) {nbytes / ms / 1e6:6.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} M={M} H={H} INTER={INTER} "
          f"layers={LAYERS}", flush=True)
    main()
