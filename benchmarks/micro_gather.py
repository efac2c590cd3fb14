"""Microbench: random row-gather cost vs row width on the TPU.

Informs the packed-table designs (walk_table rows, per-bin candidate
rows): XLA's gather lowering switches strategy with row width, and the
fast per-row DMA path was measured at 512B rows in round 1.  This
sweeps widths so table layouts are chosen from data, not guesses.

Chained dependent iterations inside one jitted fori_loop (the gathered
value perturbs the next indices), dependent scalar fetch — the honest
device timing recipe for the remote tunnel (see bench.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    n_rows = 1_000_000
    n_queries = 1_000_000
    rng = np.random.default_rng(7)
    idx0 = jnp.asarray(
        rng.integers(0, n_rows, size=n_queries), dtype=jnp.int32
    )

    @jax.jit
    def chain(table, idx, n):
        n_rows = table.shape[0]

        def body(i, carry):
            idx, acc = carry
            g = table[idx]  # (B, W) random row gather
            step = g[:, 0].astype(jnp.int32)  # all-ones: dependency
            return ((idx + step) % n_rows, acc + g[0, 1])

        _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
        return acc

    def timed(table, n):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(table, idx0, n))
            best = min(best, time.perf_counter() - t0)
        return best

    for w_floats in (4, 16, 32, 64, 128, 136, 192, 256, 384, 512):
        table = jnp.ones((n_rows, w_floats), dtype=jnp.float32)
        float(chain(table, idx0, 2))  # compile+warm
        dt = (timed(table, 42) - timed(table, 2)) / 40
        bw = n_queries * w_floats * 4 / dt / 1e9
        print(
            json.dumps(
                {
                    "row_bytes": w_floats * 4,
                    "ms_per_1M": dt * 1e3,
                    "GB_s": round(bw, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
