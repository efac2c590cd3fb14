"""Headline benchmark: cold interpolation queries/sec on one TPU chip.

Protocol parity with the reference benchmark (benchmark.f90:14-69):
* the 9-point / 8-triangle mesh of test_data/triangle.binda,
* 1,000,000 query points sampled uniformly in the bounding box shrunk
  by 10% per side,
* pass 1: all guesses cold (i_cell unset) -> seeded point location,
* pass 2: points advected by 0.01*min(domain)*velocity, warm guesses.

Timing method: the remote-tunnel TPU backend adds ~25ms fixed per-call
transport latency and its block_until_ready is unreliable, so each
measurement chains n dependent passes inside one jitted fori_loop and
fetches a dependent scalar; (t[n1]-t[n0])/(n1-n0) is honest device
time.  This mirrors steady-state production throughput where queries
stream through the device.

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
    from jax import lax

    from interpolate_unstructured_tpu import build_grid, interpolate_scalar_at
    from interpolate_unstructured_tpu.utils import meshgen
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

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
    r = lo + rng.random((n_samples, 3)) * (hi - lo)
    velocity = rng.random((n_samples, 3))
    velocity[:, 2] = 0.0
    dt = 0.01 * domain[domain > 0].min()
    r_warm = r + dt * velocity

    r_dev = jnp.asarray(r, dtype=grid.dtype)
    r_warm_dev = jnp.asarray(r_warm, dtype=grid.dtype)

    def chain_time(r0, guess, n0=1, n1=101):
        """Device time per 1M-query pass via chained dependent passes.

        min-of-5 per point and a wide n1-n0 span keep the ~25 ms
        per-call transport jitter out of the difference.
        """

        @jax.jit
        def chain(grid, r, n):
            def body(i, carry):
                r, acc = carry
                vals, ic, found = interpolate_scalar_at(
                    grid, r, 0, guess=guess, fill_value=0.0
                )
                # tiny dependent perturbation defeats loop hoisting
                return (r + 1e-12 * vals[:, None], acc + vals[0])

            _, acc = lax.fori_loop(
                0, n, body, (r, jnp.zeros((), grid.dtype))
            )
            return acc

        float(chain(grid, r0, n0))  # compile + warm

        def timed(n):
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(chain(grid, r0, n))
                best = min(best, time.perf_counter() - t0)
            return best

        return max((timed(n1) - timed(n0)) / (n1 - n0), 1e-9)

    # Correctness gate before timing
    vals, i_cell, found = jax.jit(
        lambda g, r: interpolate_scalar_at(g, r, 0)
    )(grid, r_dev)
    assert bool(found.all()), "all samples lie inside the mesh"
    err = float(jnp.max(jnp.abs(vals - (r_dev.sum(1) + 1.0))))

    t_cold = chain_time(r_dev, None)
    t_warm = chain_time(r_warm_dev, i_cell)

    cold_qps = n_samples / t_cold
    warm_qps = n_samples / t_warm

    print(
        f"# device={jax.devices()[0].device_kind} dtype={grid.dtype} "
        f"cold={t_cold * 1e3:.3f}ms ({cold_qps:.3e} q/s) "
        f"warm={t_warm * 1e3:.3f}ms ({warm_qps:.3e} q/s) max_err={err:.2e}",
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
