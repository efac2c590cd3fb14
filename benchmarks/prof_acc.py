"""Stage breakdown of the compensated-f32 accurate pass on the
1M-cell cover grid (chained-iteration timing, see bench.py):

  L  locate alone                F   full acc pass (locate+interp)
  G  acc-row gather alone        F1  locate + gather, no df32 math
  I  interp_acc (gather+df32)    F2  interp w/ loop-variant cells
  M  df32 math on a fresh buffer (no gather)
  GT gather + transpose + reduce (no df32 math)

Run: python benchmarks/prof_acc.py [--probe L,G,...]  (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


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
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from interpolate_unstructured_tpu import (
        interpolate_at_icell_acc,
        prepare_accurate,
    )
    from interpolate_unstructured_tpu.io.checkpoint import load_grid
    from interpolate_unstructured_tpu.ops import interp_acc, locate

    want = None
    if "--probe" in sys.argv:
        want = set(sys.argv[sys.argv.index("--probe") + 1].split(","))

    grid = load_grid("benchmarks/cache/tet55_f32.binda")
    grid = prepare_accurate(grid)
    print(
        f"acc_table {grid.acc_table.shape} "
        f"({grid.acc_table.shape[1] * 4}B rows)",
        flush=True,
    )
    rng = np.random.default_rng(2)
    b = 1_000_000
    r = jnp.asarray(rng.random((b, 3)), grid.dtype)
    rows0 = jnp.asarray(rng.random((b, grid.acc_table.shape[1])), jnp.float32)

    def dep(r, x):
        return r + (5e-30 * x.astype(r.dtype).sum()) * jnp.ones_like(r)

    ic0, _ = jax.jit(locate.get_cell)(grid, r)
    ic0 = jnp.maximum(ic0, 0)

    def locate_only(g, rr, n):
        def body(i, carry):
            rr, acc = carry
            ic, found = locate.get_cell(g, rr)
            return (dep(rr, ic), acc + ic[0])

        _, acc = lax.fori_loop(0, n, body, (rr, jnp.zeros((), jnp.int32)))
        return acc

    def gather_only(g, rr, ic, n):
        def body(i, carry):
            rr, acc = carry
            rows = g.acc_table[ic]
            return (dep(rr, rows[:, 0]), acc + rows[0, 0])

        _, acc = lax.fori_loop(0, n, body, (rr, jnp.zeros((), jnp.float32)))
        return acc

    def interp_only(g, rr, ic, n):
        def body(i, carry):
            rr, acc = carry
            vh, vl = interpolate_at_icell_acc(g, rr, (0,), ic)
            return (dep(rr, vh[:, 0]), acc + vh[0, 0])

        _, acc = lax.fori_loop(0, n, body, (rr, jnp.zeros((), jnp.float32)))
        return acc

    def full(g, rr, n):
        def body(i, carry):
            rr, acc = carry
            ic, found = locate.get_cell(g, rr)
            vh, vl = interpolate_at_icell_acc(g, rr, (0,), jnp.maximum(ic, 0))
            return (dep(rr, vh[:, 0]), acc + vh[0, 0])

        _, acc = lax.fori_loop(0, n, body, (rr, jnp.zeros((), jnp.float32)))
        return acc

    def loc_gather(g, rr, n):
        def body(i, carry):
            rr, acc = carry
            ic, found = locate.get_cell(g, rr)
            rows = g.acc_table[jnp.maximum(ic, 0)]
            return (dep(rr, rows[:, 0]), acc + rows[0, 0])

        _, acc = lax.fori_loop(0, n, body, (rr, jnp.zeros((), jnp.float32)))
        return acc

    def interp_dyn(g, rr, ic, n):
        def body(i, carry):
            rr, ic, acc = carry
            vh, vl = interpolate_at_icell_acc(g, rr, (0,), ic)
            # data-dependent ic keeps the gather inside the loop
            ic = jnp.maximum(ic + (vh[:, 0] > 1e30).astype(jnp.int32), 0)
            return (dep(rr, vh[:, 0]), ic, acc + vh[0, 0])

        _, _, acc = lax.fori_loop(
            0, n, body, (rr, ic, jnp.zeros((), jnp.float32))
        )
        return acc

    def math_only(g, rr, rows, n):
        def body(i, carry):
            rr, acc = carry
            rows_i = rows + rr[0, 0]  # loop-variant, cheap
            g2 = dataclasses.replace(g, acc_table=rows_i)
            vh, vl = interp_acc._interp_acc_tile(
                g2,
                rr,
                (0,),
                jnp.arange(b, dtype=jnp.int32),
                jnp.zeros_like(rr),
            )
            return (dep(rr, vh[:, 0]), acc + vh[0, 0])

        _, acc = lax.fori_loop(0, n, body, (rr, jnp.zeros((), jnp.float32)))
        return acc

    def gather_reduce(g, rr, ic, n):
        def body(i, carry):
            rr, ic, acc = carry
            ic = jnp.maximum(ic + (rr[0, 0] > 1e30).astype(jnp.int32), 0)
            gt = g.acc_table[ic].T
            s = gt.sum(0)
            return (dep(rr, s), ic, acc + s[0])

        _, _, acc = lax.fori_loop(
            0, n, body, (rr, ic, jnp.zeros((), jnp.float32))
        )
        return acc

    probes = [
        ("L", "locate only", locate_only, (grid, r)),
        ("G", "acc gather only", gather_only, (grid, r, ic0)),
        ("I", "interp_acc (gather+df32)", interp_only, (grid, r, ic0)),
        ("F", "full acc pass", full, (grid, r)),
        ("F1", "locate+gather", loc_gather, (grid, r)),
        ("F2", "interp dyn-ic", interp_dyn, (grid, r, ic0)),
        ("M", "math-on-fresh-buffer", math_only, (grid, r, rows0)),
        ("GT", "gather+T+reduce", gather_reduce, (grid, r, ic0)),
    ]
    for key, name, fn, args in probes:
        if want and key not in want:
            continue
        t = chain(fn, *args)
        print(
            f"{key:<3}{name:<26} {t * 1e3:7.2f} ms/1M  {b / t:.3e} q/s",
            flush=True,
        )


main()
