"""Isolate the fused tracer round cost: run K rounds of
ops/pallas_trace.trace_round in one jitted fori_loop (gather + kernel,
no tracer glue) and report per-round time at a given batch size.

    python -m benchmarks.prof_trace_round --n 1024 --rounds 200
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--side", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=200)
    args = ap.parse_args()

    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from benchmarks.bench_suite import make_tet_grid
    from interpolate_unstructured_tpu import add_point_data
    from interpolate_unstructured_tpu.ops import pallas_trace
    from interpolate_unstructured_tpu.trace import build_trace_table

    grid = make_tet_grid(args.side)
    pts = np.asarray(grid.points)
    cx = pts[:, :2] - 0.5
    grid, ivx = add_point_data(grid, "vx", -cx[:, 1])
    grid, ivy = add_point_data(grid, "vy", cx[:, 0])
    grid, ivz = add_point_data(grid, "vz", np.full(grid.n_points, 0.25))

    b = args.n
    table = build_trace_table(grid, jnp.asarray([ivx, ivy, ivz]))
    rng = np.random.default_rng(0)
    F0 = jnp.asarray(rng.random((pallas_trace.F_ROWS, b)), jnp.float32)
    I0 = jnp.zeros((pallas_trace.I_ROWS, b), jnp.int32)
    I0 = I0.at[pallas_trace._IC].set(
        jnp.asarray(rng.integers(0, grid.n_cells, b), jnp.int32)
    )
    I0 = I0.at[pallas_trace._WACT].set(1)
    I0 = I0.at[pallas_trace._STAGE].set(2)

    def run(g, table, F, I, k):
        def body(_, FI):
            F, I = FI
            F, I, _n = pallas_trace.trace_round(
                g, table, F, I,
                nudge=1e-6, eps_arrive=4e-6, tiny=1e-10,
                reverse=False, axisymmetric=False,
                max_steps=20, min_radius=1e-12,
            )
            return F, I
        F, I = lax.fori_loop(0, k, body, (F, I))
        return F[0, 0] + I[0, 0].astype(jnp.float32)

    f = jax.jit(run, static_argnames=())
    k = jnp.int32(args.rounds)
    _ = float(f(grid, table, F0, I0, k))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(f(grid, table, F0, I0, k))
        best = min(best, time.perf_counter() - t0)
    # one-round version to subtract fixed dispatch cost
    _ = float(f(grid, table, F0, I0, jnp.int32(1)))
    t1 = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(f(grid, table, F0, I0, jnp.int32(1)))
        t1 = min(t1, time.perf_counter() - t0)
    per = (best - t1) / (args.rounds - 1)
    print(
        f"n={b}: {args.rounds} rounds {best*1e3:.2f} ms, 1 round "
        f"{t1*1e3:.2f} ms -> {per*1e6:.1f} us/round"
    )


if __name__ == "__main__":
    main()
