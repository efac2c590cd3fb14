"""Sweep candidate-row capacity configs on the large tet mesh (TPU).

The cold candidate path's cost is gather(row_bytes) + kernel(~ops x K)
+ fallback(overflow-miss rate).  Smaller rows with finer bins trade
kernel/gather time against fallback rate; this sweep measures the
end-to-end fused query time per (cand_row_bytes, cand_bins_per_cell)
on the cached ~1M-cell tet mesh and prints a table.

    python benchmarks/sweep_cand.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (cand_row_bytes, cand_bins_per_cell, cand_min_k, fallback_div,
    #  cand_cover_row_bytes)
    # Round-3 note: keep fallback_div at 32 — 128 starved the compact
    # buffer (n_act > m every batch -> the chunked full-width path,
    # 75 ms/1M).  The chunked gather is issue-bound per ROW BYTE
    # (prof_cand A64: 2 KB rows 12.3 ms/1M) so the sweep is now a
    # two-tier ladder: small premultiplied main rows for the dense
    # phase-0 probe, cover-wide extension rows (ext_max_k=32 >= worst
    # bin 24) absorbing overflow-bin misses exactly.  cover=0 disables
    # whole-table cover widening so row_bytes controls the main tier.
    (768, 2.0, 7, 32, 0),    # K=9: covers 65% of bins at 0.75x gather
    (1024, 2.0, 7, 32, 0),   # K=12: same 65% here (counts jump 9->13)
    (768, 3.0, 7, 32, 0),    # K=9, finer bins: lower overflow rate
    (1024, 3.0, 7, 32, 0),   # K=12, finer bins
    # fbq at (1024, 3.0) is 5.6% — above b/32 so the full-width
    # fallback runs (+2.6 ms flat, why all rows above read ~14.5).
    # Wider compact buffers let the cheap small path absorb it:
    (1024, 3.0, 7, 16, 0),   # m = 6.25% > 5.6% miss rate
    (1024, 3.0, 7, 8, 0),    # m = 12.5%: headroom for chunk variance
]


def chain(fn, *args, n0=1, n1=11):
    import jax

    jfn = jax.jit(fn)
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # optional config subset "lo:hi" so one run fits a timeout window
    configs = CONFIGS
    if len(sys.argv) > 2:
        lo, hi = (int(x) for x in sys.argv[2].split(":"))
        configs = CONFIGS[lo:hi]

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    rng = np.random.default_rng(2)
    r_h = rng.random((b, 3))

    def dep(r, x):
        # Full-reduction dep: a first-element dep lets XLA DCE unrolled
        # chunks whose outputs the carry doesn't touch (see prof_cand)
        return r + (1e-12 * x.astype(r.dtype).sum()) * jnp.ones_like(r)

    print(f"{'rowB':>5} {'bpc':>4} {'K':>3} {'bins':>9} {'ovfl%':>6} "
          f"{'fbq%':>6} {'load_s':>7} {'ms/1M':>7} {'q/s':>10}",
          file=sys.stderr)

    for rb, bpc, mink, fbdiv, cover in configs:
        from interpolate_unstructured_tpu.utils.config import IUConfig

        cfg = IUConfig(
            cand_row_bytes=rb, cand_bins_per_cell=bpc, cand_min_k=mink,
            cand_fallback_divisor=fbdiv, cand_max_bins=1 << 23,
            cand_cover_row_bytes=cover,
        )
        t0 = time.perf_counter()
        grid = load_grid(cache, config=cfg)
        jax.block_until_ready(grid.cand_table)
        load_s = time.perf_counter() - t0
        k = grid.cand_ids.shape[1]
        n_bins = int(np.prod(grid.cand_shape))
        counts = np.asarray(grid.cand_count)
        ovfl = float((counts > k).mean())

        r = jnp.asarray(r_h, grid.dtype)

        # fallback-query rate: queries landing in overflow bins that
        # phase-0 missed (what the extension probe has to absorb)
        ic, found, vals = jax.jit(
            lambda g, r: locate._candidates_query(g, r, (0,))
        )(grid, r)
        assert bool(found.all()), "unit-box queries must all be found"
        err = float(jnp.abs(
            vals[0] - (r.sum(1) + 1.0)
        ).max())
        assert err < 5e-5, f"linear exactness broke: {err}"
        bin_counts = counts[np.asarray(locate._cand_bin_index(grid, r))]
        fbq = float((bin_counts > k).mean())

        def interp_fused(grid, r, n):
            def body(i, carry):
                r, acc = carry
                ic, found, vals = locate._candidates_query(grid, r, (0,))
                return (dep(r, vals[0]), acc + vals[0, 0])
            _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
            return acc

        t = chain(interp_fused, grid, r)
        print(f"{rb:>5} {bpc:>4.1f} {k:>3} {n_bins:>9} {100*ovfl:>6.2f} "
              f"{100*fbq:>6.2f} {load_s:>7.1f} {t*1e3:>7.2f} {b/t:>10.3e}",
              file=sys.stderr)
        del grid, r, ic, found, vals


if __name__ == "__main__":
    main()
