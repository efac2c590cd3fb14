"""Small-batch random row-gather cost on a big (998k x 64 f32) table.

The fused tracer round at 1024 lanes measures ~82 us on the 998k-cell
mesh vs ~9.5 us on a 24.6k-cell one (RESULTS.md): hypothesis — the
per-round gather is LATENCY-bound at small B (too few outstanding
row fetches to cover HBM latency), not issue-bound, so gathering the
1-ring (own row + nf neighbor rows = 5x rows) should cost nearly the
same as B rows and buy a second walk hop per round.

    python benchmarks/micro_trace_gather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 998_250
    w = 64
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n, w), np.float32))

    @jax.jit
    def chain(table, idx, k):
        def body(_, c):
            idx, acc = c
            g = table[idx]  # (B, W)
            s = g[:, 0]
            # dependent, distribution-preserving index update
            idx = (idx + 1 + (s > 2.0).astype(jnp.int32)) % n
            return idx, acc + s[0]

        idx, acc = lax.fori_loop(0, k, body, (idx, jnp.float32(0)))
        return acc

    for b in (1024, 2048, 5120, 9216, 21504, 65536):
        idx0 = jnp.asarray(rng.integers(0, n, b), jnp.int32)
        float(chain(table, idx0, 1))
        ts = []
        for k in (10, 210):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(table, idx0, k))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        per = (ts[1] - ts[0]) / 200
        print(f"B={b:6d}: {per * 1e6:7.1f} us/round "
              f"({per / b * 1e9:6.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
