"""Do concurrent device_put transfers overlap through the axon tunnel?

The serving uploader moves ~7 MB uint8 chunks (16 x 384x384x3); each
transfer pays ~0.5 s setup + bytes/45 MB/s. If two threads' device_puts
overlap, a 2-thread uploader halves the ramp's upload wall; if the tunnel
serializes them, it doesn't. Measures sequential vs 2-thread wall for the
same 6 chunks.
"""
import sys, time, threading
sys.path.insert(0, "/root/repo")
import numpy as np, jax

rows = [np.random.randint(0, 256, (16, 384, 384, 3), dtype=np.uint8)
        for _ in range(6)]
# warm one transfer (plugin init)
x = jax.device_put(rows[0]); _ = np.asarray(x[0, 0, 0]); del x

def put(r, out):
    x = jax.device_put(r)
    out.append(float(np.asarray(x[0, 0, 0, 0])))  # force completion

for nthreads in (1, 2, 3):
    t0 = time.perf_counter()
    out = []
    if nthreads == 1:
        for r in rows: put(r, out)
    else:
        i = 0
        while i < len(rows):
            ts = [threading.Thread(target=put, args=(r, out))
                  for r in rows[i:i+nthreads]]
            for t in ts: t.start()
            for t in ts: t.join()
            i += nthreads
    dt = time.perf_counter() - t0
    print(f"threads={nthreads}: {dt:.2f}s total, {dt/len(rows)*1e3:.0f} ms/chunk")
