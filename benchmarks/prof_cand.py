"""Phase breakdown of the large-mesh cold candidate path on TPU.

Times each stage of ``_candidates_query`` separately with the
chained-dependent-iteration protocol (see bench.py): row gather alone,
phase-0 containment math, the compaction machinery, the full locate,
and the fused interpolation.  Run on the real TPU:

    python benchmarks/prof_cand.py [n_queries]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, *args, n0=1, n1=11):
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    grid = load_grid(cache)
    print(f"# grid: {grid.n_cells} cells, K={grid.cand_ids.shape[1]}, "
          f"row={grid.cand_table.shape[1] * 4}B, "
          f"table={grid.cand_table.nbytes / 1e9:.2f} GB", file=sys.stderr)

    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.random((b, 3)), grid.dtype)

    def dep(r, x):
        # The dep MUST consume a FULL reduction of x: a first-element
        # dep (x[:1]) lets XLA dead-code-eliminate every unrolled chunk
        # whose output the carry doesn't touch — measured as a bogus 7x
        # "speedup" of the chunked candidate path in round 3.
        # The scale MUST keep the perturbation below one ulp of the
        # queries: cell-id outputs sum to ~5e11, and at 1e-12 that
        # drifted r by ~0.5/pass — the queries walked out of the domain
        # and the "measurement" timed the all-miss path (C read 68 ms
        # while the strictly-bigger D read 14.5).  5e-30 * 5e11 = 2e-18
        # adds exactly 0.0 in f32 while keeping the data dependency.
        return r + (5e-30 * x.astype(r.dtype).sum()) * jnp.ones_like(r)

    # -- A: bin index + row gather only ------------------------------
    def gather_only(grid, r, n):
        def body(i, carry):
            r, acc = carry
            g = grid.cand_table[locate._cand_bin_index(grid, r)]
            s = g[:, 0]
            return (dep(r, s), acc + s[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    # -- B: gather + probe kernel only (no fallback/plumbing) --------
    from interpolate_unstructured_tpu.models.grid import cand_fused_nv
    from interpolate_unstructured_tpu.ops import pallas_cand

    from interpolate_unstructured_tpu.models.grid import (
        _qcand_floats_per, cand_is_quantized)

    nf = grid.n_faces_per_cell
    npc = grid.n_points_per_cell
    k_max = grid.cand_ids.shape[1]
    nv = cand_fused_nv(grid)
    quantized = cand_is_quantized(grid.cell_type, grid.dtype, grid.config)
    if quantized:
        count_col = k_max * _qcand_floats_per(grid.cell_type, nv)
    else:
        is_quad = grid.cell_type == "quad"
        id_role = 4 * nf + (3 * npc if is_quad else 0)
        count_col = k_max * (id_role + 1 + npc * nv)

    eps = grid.config.eps_inside + grid.cand_qeps

    def queries_t(rt_t):
        if not quantized:
            return locate._cand_bin_index_t(grid, rt_t), rt_t
        ijk = locate._cand_bin_ijk_t(grid, rt_t)
        nby, nbz = grid.cand_shape[1], grid.cand_shape[2]
        idx = (ijk[0] * nby + ijk[1]) * nbz + ijk[2]
        return idx, locate._cand_local_t(grid, rt_t, ijk)

    def phase0(grid, r, n):
        def body(i, carry):
            r, acc = carry
            idx, rq_t = queries_t(r.T)
            id_best, _, _ = pallas_cand.cand_rows_query(
                grid, grid.cand_table, idx, rq_t, (), count_col,
                eps, k_max, k_max=k_max, quantized=quantized,
                nv_fused=nv,
            )
            return (dep(r, id_best), acc + id_best[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), jnp.int32)))
        return acc

    # -- B2: gather + probe kernel with fused values -----------------
    def phase0v(grid, r, n):
        def body(i, carry):
            r, acc = carry
            idx, rq_t = queries_t(r.T)
            _, _, vals = pallas_cand.cand_rows_query(
                grid, grid.cand_table, idx, rq_t, (0,), count_col,
                eps, k_max, k_max=k_max, quantized=quantized,
                nv_fused=nv,
            )
            return (dep(r, vals[0]), acc + vals[0, 0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    # -- A64/B64: gather / gather+kernel at the PRODUCTION chunk size
    # (A and B above run one full-batch tile; the shipped path tiles
    # queries at locate._cand_chunk(grid) so the gathered rows stay
    # VMEM-resident — these stages isolate that regime)
    chunk = locate._cand_chunk(grid)

    def _chunked(tile):
        def run(r_t):
            bq = r_t.shape[1]
            pad = (-bq) % chunk
            rp_t = jnp.pad(r_t, ((0, 0), (0, pad)))
            return lax.map(
                tile, jnp.moveaxis(rp_t.reshape(3, -1, chunk), 1, 0)
            )
        return run

    def gather_chunked(grid, r, n):
        def tile(rt_t):
            idx = locate._cand_bin_index_t(grid, rt_t)
            return grid.cand_table[idx][:, 0]

        run = _chunked(tile)

        def body(i, carry):
            r, acc = carry
            s = run(r.T).reshape(-1)
            return (dep(r, s), acc + s[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    def phase0_chunked(grid, r, n):
        def tile(rt_t):
            idx, rq_t = queries_t(rt_t)
            id_best, aux, _ = pallas_cand.cand_rows_query(
                grid, grid.cand_table, idx, rq_t, (), count_col,
                eps, k_max, k_max=k_max, quantized=quantized,
                nv_fused=nv,
            )
            return id_best + aux

        run = _chunked(tile)

        def body(i, carry):
            r, acc = carry
            s = run(r.T).reshape(-1)
            return (dep(r, s), acc + s[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), jnp.int32)))
        return acc

    # -- C: full locate ----------------------------------------------
    def locate_full(grid, r, n):
        def body(i, carry):
            r, acc = carry
            ic, found = locate.locate_candidates(grid, r)
            return (dep(r, ic), acc + ic[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), jnp.int32)))
        return acc

    # -- D: fused interpolation --------------------------------------
    def interp_fused(grid, r, n):
        def body(i, carry):
            r, acc = carry
            ic, found, vals = locate._candidates_query(grid, r, (0,))
            return (dep(r, vals[0]), acc + vals[0, 0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    # -- E: compaction machinery on a 2% mask ------------------------
    mask = jnp.asarray(rng.random(b) < 0.02)
    m = -(-max(1024, b // grid.config.cand_fallback_divisor) // 8) * 8

    def compact_only(mask, r, n):
        def body(i, carry):
            mask, acc = carry
            idx = locate._compact_indices(mask, m)
            return (mask ^ (jnp.zeros_like(mask).at[0].set(acc % 2 == 0)),
                    acc + idx[0])
        _, acc = lax.fori_loop(0, n, body, (mask, jnp.zeros((), jnp.int32)))
        return acc

    for name, fn, args in [
        ("A gather-only", gather_only, (grid, r)),
        ("B gather+kernel", phase0, (grid, r)),
        ("B2 +fused vals", phase0v, (grid, r)),
        ("A64 gather@chunk", gather_chunked, (grid, r)),
        ("B64 kernel@chunk", phase0_chunked, (grid, r)),
        ("C locate_full", locate_full, (grid, r)),
        ("D interp_fused", interp_fused, (grid, r)),
        ("E compaction", compact_only, (mask, r)),
    ]:
        t = chain(fn, *args)
        print(f"{name:16s} {t * 1e3:8.2f} ms/pass  "
              f"{b / t:.3e} q/s", file=sys.stderr)


if __name__ == "__main__":
    main()
