"""Round-4 cold-path decomposition: chunk fill/drain vs row stride.

prof_cand round-4 established:
  A  full-batch narrow touch (4 B/row via slice-folded gather): 7.57 ms/1M
  A64 the same touch at production 32-40k chunks:              11.92
  B64 chunked touch + FULL row read + Pallas kernel:           12.45
=> the +4.3 ms is per-chunk gather pipeline fill/drain, NOT row bytes.

This sweep measures (on the real 1M-cell cover grid):
  1. the real phase-0 pipeline (gather + kernel) vs chunk size,
  2. the narrow chunked touch vs chunk size (fill/drain isolation),
  3. full-batch narrow touch vs TABLE STRIDE (synthetic 512 B / 256 B
     tables) — is a 512 B-stride tier-1 table worth building?

    python benchmarks/sweep_chunk.py
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
    b = 1_000_000
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    grid = load_grid(cache)
    print(f"# grid K={grid.cand_ids.shape[1]} row="
          f"{grid.cand_table.shape[1]*4}B default_chunk="
          f"{locate._cand_chunk(grid)}", flush=True)

    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.random((b, 3)), grid.dtype)

    def dep(r, x):
        return r + (5e-30 * x.astype(r.dtype).sum()) * jnp.ones_like(r)

    # ---- 1+2: chunk-size sweep, narrow touch and real fused interp ----
    for chunk in (24576, 32768, 40960, 49152, 65536, 98304):
        gc = dataclasses.replace(
            grid,
            config=dataclasses.replace(
                grid.config, cand_chunk_queries=chunk
            ),
        )

        def narrow(gc, r, n, chunk=chunk):
            def tile(rt_t):
                idx = locate._cand_bin_index_t(gc, rt_t)
                return gc.cand_table[idx][:, 0]

            def body(i, carry):
                r, acc = carry
                rt = r.T
                pad = (-b) % chunk
                rp_t = jnp.pad(rt, ((0, 0), (0, pad)))
                s = lax.map(
                    tile, jnp.moveaxis(rp_t.reshape(3, -1, chunk), 1, 0)
                ).reshape(-1)
                return (dep(r, s), acc + s[0])

            _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), gc.dtype)))
            return acc

        def fused(gc, r, n):
            def body(i, carry):
                r, acc = carry
                ic, found, vals = locate._candidates_query(gc, r, (0,))
                return (dep(r, vals[0]), acc + vals[0, 0])

            _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), gc.dtype)))
            return acc

        tn = chain(narrow, gc, r)
        tf = chain(fused, gc, r)
        buf = chunk * gc.cand_table.shape[1] * 4 / 2**20
        print(f"chunk {chunk:6d} ({buf:5.0f} MiB buf): "
              f"narrow {tn*1e3:6.2f}  fused {tf*1e3:6.2f} ms/1M "
              f"({1e6/tf:.3e} q/s)", flush=True)

    # ---- 3: narrow-touch cost vs table stride (synthetic) ----
    n_rows = grid.cand_table.shape[0]
    idx = jnp.asarray(rng.integers(0, n_rows, b), jnp.int32)
    for w in (64, 128, 192, 256, 384):
        tab = jnp.asarray(rng.random((n_rows, w), dtype=np.float32))

        def touch(tab, idx, n):
            def body(i, carry):
                ix, acc = carry
                s = tab[ix][:, 0]
                ix = (ix + (s[:1] > 1e30).astype(jnp.int32)) % n_rows
                return (ix, acc + s[0])

            _, acc = lax.fori_loop(0, n, body, (idx, jnp.zeros((), jnp.float32)))
            return acc

        t = chain(touch, tab, idx)
        print(f"stride {w*4:5d}B narrow touch, full batch: {t*1e3:6.2f} ms/1M",
              flush=True)
        del tab


if __name__ == "__main__":
    main()
