"""Headline benchmark: cold interpolation queries/sec on one TPU chip.

Protocol parity with the reference benchmark (benchmark.f90:14-69):
* the 9-point / 8-triangle mesh of test_data/triangle.binda,
* 1,000,000 query points sampled uniformly in the bounding box shrunk
  by 10% per side,
* pass 1: all guesses cold (i_cell unset) -> seeded point location,
* pass 2: points advected by 0.01*min(domain)*velocity, warm guesses.

Prints ONE JSON line; the headline metric is cold queries/sec/chip.
``vs_baseline`` is measured against BASELINE.json's stated target of
1e8 cold queries/sec (the reference publishes no numbers — BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from interpolate_unstructured_tpu import build_grid, interpolate_scalar_at
    from interpolate_unstructured_tpu.utils import meshgen

    n_samples = 1_000_000

    # triangle.binda geometry: [0,2]^2 split into a 2x2 grid of squares,
    # each split into 2 triangles (9 points / 8 cells)
    points, cells, neighbors = meshgen.triangle_rect_mesh(2, 2)
    poly = points.sum(axis=1) + 1.0
    grid = build_grid(
        points, cells, neighbors, "triangle",
        point_data={"Polynomial": poly},
    )

    rng = np.random.default_rng(2024)
    rmin = points.min(axis=0)
    rmax = points.max(axis=0)
    domain = rmax - rmin
    lo = rmin + 0.1 * domain
    hi = rmax - 0.1 * domain
    # z extent is zero; keep z = 0 exactly
    r = lo + rng.random((n_samples, 3)) * (hi - lo)
    velocity = rng.random((n_samples, 3))
    velocity[:, 2] = 0.0

    dt = 0.01 * domain[domain > 0].min()
    r_warm = r + dt * velocity

    r_dev = jnp.asarray(r, dtype=grid.dtype)
    r_warm_dev = jnp.asarray(r_warm, dtype=grid.dtype)

    @jax.jit
    def query_cold(grid, r):
        return interpolate_scalar_at(grid, r, 0)

    @jax.jit
    def query_warm(grid, r, guess):
        return interpolate_scalar_at(grid, r, 0, guess=guess)

    # Warm-up / compile
    vals, i_cell, found = query_cold(grid, r_dev)
    vals.block_until_ready()
    assert bool(found.all()), "all samples lie inside the mesh"
    err = float(jnp.max(jnp.abs(vals - (r_dev.sum(1) + 1.0))))

    def time_best(f, *args, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t_cold = time_best(query_cold, grid, r_dev)
    vals_w, _, _ = query_warm(grid, r_warm_dev, i_cell)
    jax.block_until_ready(vals_w)
    t_warm = time_best(query_warm, grid, r_warm_dev, i_cell)

    cold_qps = n_samples / t_cold
    warm_qps = n_samples / t_warm

    print(
        f"# device={jax.devices()[0].device_kind} dtype={grid.dtype} "
        f"cold={t_cold:.4f}s ({cold_qps:.3e} q/s) "
        f"warm={t_warm:.4f}s ({warm_qps:.3e} q/s) max_err={err:.2e}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "cold_interpolation_queries_per_sec_per_chip",
                "value": cold_qps,
                "unit": "queries/s",
                "vs_baseline": cold_qps / 1e8,
            }
        )
    )


if __name__ == "__main__":
    main()
