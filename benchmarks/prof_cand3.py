"""Parity + timing of the Pallas candidate-row kernel vs XLA paths.

    python benchmarks/prof_cand3.py [n_queries]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from interpolate_unstructured_tpu.ops import locate, pallas_cand
    from interpolate_unstructured_tpu.models.grid import cand_fused_nv
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    grid = load_grid(cache)
    nf, npc = grid.n_faces_per_cell, grid.n_points_per_cell
    K = grid.cand_ids.shape[1]
    nv = cand_fused_nv(grid)
    is_quad = grid.cell_type == "quad"
    data_role0 = 4 * nf + (3 * npc if is_quad else nf) + 1
    count_col = K * (data_role0 + npc * nv)

    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.random((b, 3)), grid.dtype)

    # ---- parity on 64k queries --------------------------------------
    rs = r[:65536]
    ic_ref, found_ref, vals_ref = locate._candidates_query(grid, rs, (0,))

    def run_pallas(grid, rt, slots):
        idx = locate._cand_bin_index(grid, rt)
        return pallas_cand.cand_rows_query(
            grid, grid.cand_table, idx, rt.T, slots, count_col, tile=tile)

    m, ic, cnt, vals = jax.jit(
        lambda g, r: run_pallas(g, r, (0,)))(grid, rs)
    vals = vals.T
    eps = grid.config.eps_inside
    f_new = np.asarray(m >= -eps) & (np.asarray(ic) >= 0)
    ok = np.asarray(found_ref) & f_new
    agree = (np.asarray(ic)[ok] == np.asarray(ic_ref)[ok]).mean()
    verr = np.abs(np.asarray(vals)[ok, 0]
                  - np.asarray(vals_ref)[ok, 0]).max()
    print(f"# parity: agree {agree:.5f} val err {verr:.2e} "
          f"phase0-found {f_new.mean():.4f} vs ref {np.asarray(found_ref).mean():.4f}",
          file=sys.stderr)

    def dep(r, x):
        return r + 1e-12 * x.astype(r.dtype)[:1, None]

    def f_locate(grid, r, n):
        def body(i, carry):
            r, acc = carry
            m, ic, c, _ = run_pallas(grid, r, ())
            return (dep(r, ic), acc + ic[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), jnp.int32)))
        return acc

    def f_vals(grid, r, n):
        def body(i, carry):
            r, acc = carry
            m, ic, c, v = run_pallas(grid, r, (0,))
            return (dep(r, v[0]), acc + v[0, 0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    for name, fn in [("pallas locate", f_locate), ("pallas +vals", f_vals)]:
        t = chain(fn, grid, r)
        print(f"{name:14s} tile={tile} {t * 1e3:8.2f} ms/pass  "
              f"{b / t:.3e} q/s", file=sys.stderr)


def main2():
    """Kernel-only timing on a pre-gathered buffer."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.io.checkpoint import load_grid
    from interpolate_unstructured_tpu.ops import locate, pallas_cand
    from interpolate_unstructured_tpu.models.grid import cand_fused_nv
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cache", "tet55_f32.binda")
    grid = load_grid(cache)
    nf, npc = grid.n_faces_per_cell, grid.n_points_per_cell
    K = grid.cand_ids.shape[1]
    nv = cand_fused_nv(grid)
    data_role0 = 4 * nf + nf + 1
    count_col = K * (data_role0 + npc * nv)

    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.random((b, 3)), grid.dtype)
    import jax as _jax
    g = grid.cand_table
    idx0 = _jax.jit(lambda grid, r: locate._cand_bin_index(grid, r))(grid, r)
    idx0.block_until_ready()

    def dep(r, x):
        return r + 1e-12 * x.astype(r.dtype)[:1, None]

    def f_kernel(g, r, n):
        def body(i, carry):
            r, acc = carry
            m, ic, c, _ = pallas_cand.cand_rows_query(
                grid, g, idx0, r.T, (), count_col, tile=tile)
            return (dep(r, ic), acc + ic[0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), jnp.int32)))
        return acc

    def f_kernel_vals(g, r, n):
        def body(i, carry):
            r, acc = carry
            m, ic, c, v = pallas_cand.cand_rows_query(
                grid, g, idx0, r.T, (0,), count_col, tile=tile)
            return (dep(r, v[0]), acc + v[0, 0])
        _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
        return acc

    for name, fn in [("kernel-only", f_kernel), ("kernel+vals", f_kernel_vals)]:
        t = chain(fn, g, r)
        print(f"{name:12s} tile={tile} {t * 1e3:8.2f} ms/pass  "
              f"{b / t:.3e} q/s", file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "k":
        main2()
    else:
        main()
