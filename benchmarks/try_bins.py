"""Can finer candidate bins cut the worst-bin count to <= 19?

At 19 quantized tet candidates a cover row fits 256 floats (1 KB
stride) instead of the current K=24 / 1536 B: read-touch drops 7.6 ->
5.8 ms/1M (sweep_chunk stride table).  This rebuilds the 1M-cell
grid's candidate bins at several bins-per-cell settings and reports
the worst-bin count + end-to-end fused locate time.

    python benchmarks/try_bins.py [bpc ...]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, *args, n0=1, n1=6):
    import jax

    jfn = jax.jit(fn, static_argnums=())
    float(jfn(*args, n0))

    def timed(n):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jfn(*args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(n1) - timed(n0)) / (n1 - n0), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.io.checkpoint import load_grid
    from interpolate_unstructured_tpu.ops import locate
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    bpcs = [float(a) for a in sys.argv[1:]] or [2.6, 3.2]

    rng = np.random.default_rng(2)
    r_np = rng.random((1_000_000, 3))

    for bpc in bpcs:
        from interpolate_unstructured_tpu.utils.config import IUConfig

        cfg = dataclasses.replace(IUConfig(), cand_bins_per_cell=bpc)
        t0 = time.perf_counter()
        grid = load_grid(cache, config=cfg)
        dt = time.perf_counter() - t0
        k = grid.cand_ids.shape[1]
        worst = int(np.asarray(grid.cand_count).max())
        row_b = grid.cand_table.shape[1] * 4
        print(f"bpc {bpc}: rebuild {dt:.0f}s, K={k} worst={worst} "
              f"row={row_b}B shape={grid.cand_shape} "
              f"table={grid.cand_table.nbytes/2**30:.2f}GiB", flush=True)

        r = jnp.asarray(r_np, grid.dtype)
        from interpolate_unstructured_tpu.ops.interp import (
            interpolate_scalar_at,
        )

        # correctness gate
        v, ic, found = jax.jit(
            lambda g, rr: interpolate_scalar_at(g, rr, 0, fill_value=0.0)
        )(grid, r[:100_000])
        assert bool(found.all())
        err = float(jnp.abs(
            v - (r[:100_000].sum(axis=1) + 1.0)
        ).max())
        assert err < 5e-5, err

        def fused(grid, r, n):
            def body(i, carry):
                r, acc = carry
                ic, found, vals = locate._candidates_query(grid, r, (0,))
                dep = r + (5e-30 * vals[0].sum()) * jnp.ones_like(r)
                return (dep, acc + vals[0, 0])

            _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
            return acc

        t = chain(fused, grid, r)
        print(f"  fused interp: {t*1e3:6.2f} ms/1M ({1e-3/t:.3e} q/s)",
              flush=True)
        del grid


if __name__ == "__main__":
    main()
