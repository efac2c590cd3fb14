"""Tracer profiling: time integrate_along_field on the bench tet mesh
at several batch sizes, reporting accepted-steps/s, iteration count and
fused-kernel rounds.  Run on the TPU (default platform):

    python benchmarks/prof_trace.py [--n 65536] [--side 16] [--steps 256]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--side", type=int, default=16)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import make_tet_grid
    from interpolate_unstructured_tpu import add_point_data
    from interpolate_unstructured_tpu.trace import integrate_along_field

    grid = make_tet_grid(args.side)
    pts = np.asarray(grid.points)
    cx = pts[:, :2] - 0.5
    grid, ivx = add_point_data(grid, "vx", -cx[:, 1])
    grid, ivy = add_point_data(grid, "vy", cx[:, 0])
    grid, ivz = add_point_data(grid, "vz", np.full(grid.n_points, 0.25))
    rng = np.random.default_rng(3)
    y0 = jnp.asarray(0.3 + 0.4 * rng.random((args.n, 3)), grid.dtype)

    def one(g, y0):
        return integrate_along_field(
            g, y0, (ivx, ivy, ivz), nvar=0,
            min_dx=1e-4, max_dx=0.05, max_steps=args.steps,
            rtol=1e-3, atol=1e-3,
        )

    # Chained timing (CLAUDE.md: never trust single-call wall-clock
    # through the axon tunnel): T dependent traces inside one jit;
    # 0.0*y keeps the data dependency without changing the seeds
    # (XLA does not fold 0*x for floats).
    T = 4

    def chained(g, y0):
        res = None
        for _ in range(T):
            res = one(g, y0)
            y0 = y0 + 0.0 * res.y[:, 0, :]
        return res

    f1 = jax.jit(one)
    fT = jax.jit(chained)
    res = f1(grid, y0)
    total = int(np.asarray(res.n_steps).clip(max=args.steps).sum())
    best1 = bestT = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        _ = np.asarray(f1(grid, y0).n_steps)
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(fT(grid, y0).n_steps)
        bestT = min(bestT, time.perf_counter() - t0)
    best = (bestT - best1) / (T - 1)  # transport latency cancels
    print(f"  raw: single {best1*1e3:.1f} ms, chained x{T} {bestT*1e3:.1f} ms")
    print(
        f"n={args.n} side={args.side} cells={grid.n_cells} "
        f"steps={args.steps}: {best*1e3:.1f} ms, "
        f"{total/best:.3e} accepted_steps/s, "
        f"mean_steps={total/args.n:.1f}, "
        f"max_iter={int(np.asarray(res.n_iterations).max())}, "
        f"n_rounds={int(res.n_rounds)}"
    )


if __name__ == "__main__":
    main()
