"""Headline benchmark: cold interpolation queries/sec on one TPU chip.

Protocol parity with the reference benchmark (benchmark.f90:14-69):
* the 9-point / 8-triangle mesh of test_data/triangle.binda,
* 1,000,000 query points sampled uniformly in the bounding box shrunk
  by 10% per side,
* pass 1: all guesses cold (i_cell unset) -> seeded point location,
* pass 2: points advected by 0.01*min(domain)*velocity, warm guesses.

Beyond the reference protocol the JSON line also reports the hard
numbers the tiny mesh cannot probe:
* ``large_mesh_cold_qps`` — 10M cold queries against a ~1M-cell tet
  mesh through the per-bin candidate path (the grid round-trips through
  save_grid/load_grid, proving the checkpoint path at scale), and
* ``warm_walk_qps`` — the warm pass on a walk-mode grid, so the
  guess-seeded neighbor walk itself is exercised (in brute-force mode
  cold and warm share one code path and the warm row says nothing).

Timing method: the remote-tunnel TPU backend adds ~25ms fixed per-call
transport latency and its block_until_ready is unreliable, so each
measurement chains n dependent passes inside one jitted fori_loop and
fetches a dependent scalar; (t[n1]-t[n0])/(n1-n0) is honest device
time.  This mirrors steady-state production throughput where queries
stream through the device.  Grids and guesses are jit ARGUMENTS (never
closures): closed-over device arrays ship as constants through the
remote-compile tunnel and overflow its request limit.  The warm pass
chains each iteration's located cells into the next iteration's
guesses.

Prints ONE JSON line; the headline metric is cold queries/sec/chip on
the reference protocol.  ``vs_baseline`` is measured against
BASELINE.json's stated target of 1e8 cold queries/sec (the reference
publishes no numbers — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

LARGE_N_SIDE = 55  # ~998k tets
LARGE_N_QUERIES = 10_000_000
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "benchmarks", "cache")


def chain_time(grid, r0, guess=None, n0=1, n1=101):
    """Device time per pass via chained dependent passes.

    min-of-5 per point and a wide n1-n0 span keep the ~25 ms
    per-call transport jitter out of the difference.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu import interpolate_scalar_at

    if guess is None:

        @jax.jit
        def chain(grid, r, n):
            def body(i, carry):
                r, acc = carry
                vals, ic, found = interpolate_scalar_at(
                    grid, r, 0, fill_value=0.0
                )
                # tiny dependent perturbation defeats loop hoisting
                return (r + 1e-12 * vals[:, None], acc + vals[0])

            _, acc = lax.fori_loop(0, n, body, (r, jnp.zeros((), grid.dtype)))
            return acc

        args = (grid, r0)
    else:

        @jax.jit
        def chain(grid, r, guess, n):
            def body(i, carry):
                r, g, acc = carry
                vals, ic, found = interpolate_scalar_at(
                    grid, r, 0, guess=g, fill_value=0.0
                )
                # chain the located cells into the next pass's guesses
                return (r + 1e-12 * vals[:, None], ic, acc + vals[0])

            _, _, acc = lax.fori_loop(
                0, n, body, (r, guess, jnp.zeros((), grid.dtype))
            )
            return acc

        args = (grid, r0, guess)

    float(chain(*args, n0))  # compile + warm

    def timed(n):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(*args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(n1) - timed(n0)) / (n1 - n0), 1e-9)


def toy_protocol():
    """The reference benchmark protocol (benchmark.f90): 8-cell mesh."""
    import jax
    import jax.numpy as jnp

    from interpolate_unstructured_tpu import build_grid, interpolate_scalar_at
    from interpolate_unstructured_tpu.utils import meshgen

    n_samples = 1_000_000

    # triangle.binda geometry: [0,2]^2 split into a 2x2 grid of squares,
    # each split into 2 triangles (9 points / 8 cells)
    points, cells, neighbors = meshgen.triangle_rect_mesh(2, 2)
    poly = points.sum(axis=1) + 1.0
    kw = dict(point_data={"Polynomial": poly})
    grid = build_grid(points, cells, neighbors, "triangle", **kw)
    grid_walk = build_grid(
        points, cells, neighbors, "triangle", locate_mode="walk", **kw
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

    # Correctness gate before timing
    vals, i_cell, found = jax.jit(
        lambda g, r: interpolate_scalar_at(g, r, 0)
    )(grid, r_dev)
    assert bool(found.all()), "all samples lie inside the mesh"
    err = float(jnp.max(jnp.abs(vals - (r_dev.sum(1) + 1.0))))

    t_cold = chain_time(grid, r_dev)
    t_warm = chain_time(grid, r_warm_dev, guess=i_cell)
    # Same warm protocol on the walk-mode grid: the guess-seeded
    # neighbor walk is the code under test here
    t_warm_walk = chain_time(grid_walk, r_warm_dev, guess=i_cell)

    # Measured local serial denominators (VERDICT r3 item 5): the
    # Fortran reference is unbuildable here (BASELINE.md), so the same
    # protocol runs single-core on this host's CPU — a per-query numpy
    # serial walk (understates compiled serial code: Python overhead)
    # and a vectorized single-core numpy brute-force (overstates it).
    # speedup_vs_serial uses the FASTER bracket (conservative).
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from serial_baseline import measure as serial_measure

    serial = serial_measure(
        np.asarray(points, np.float64), np.asarray(cells),
        np.asarray(neighbors), np.asarray(poly, np.float64), r
    )

    return {
        "cold_qps": n_samples / t_cold,
        "warm_qps": n_samples / t_warm,
        "warm_walk_qps": n_samples / t_warm_walk,
        "max_err": err,
        "serial_qps": serial["serial_qps"],
        "vectorized_cpu_qps": serial["vectorized_cpu_qps"],
        # compiled C++ oracle (native/serial_oracle.cc) — the closest
        # stand-in for a local Fortran benchmark.f90 build
        "compiled_serial_qps": serial.get("compiled_serial_qps"),
        "device": jax.devices()[0].device_kind,
        "dtype": str(grid.dtype),
    }


def trace_at_scale(grid):
    """1024 field lines on the ~1M-cell mesh (BASELINE config 5's
    warm-start-coherent workload at scale) plus the single-core
    compiled denominator (VERDICT r4 item 4).

    The fused per-cell trace table is prebuilt once and passed in —
    repeated traces over one field are the reference's usage model
    (benchmark.f90 / test_trace_field.f90 reuse the grid), and inline
    assembly of the 244 MB table costs more than tracing the bundle.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu import (
        add_point_data,
        build_trace_table,
        integrate_along_field,
    )

    out = {}
    try:
        pts = np.asarray(grid.points)
        cx = pts[:, :2] - 0.5
        fld = np.stack(
            [-cx[:, 1], cx[:, 0], np.full(grid.n_points, 0.25)], axis=1
        )
        # fuse=False: the tracer reads the field through its own table;
        # extending the multi-GB candidate rows would be pure cost
        g2, ivx = add_point_data(grid, "vx", fld[:, 0], fuse=False)
        g2, ivy = add_point_data(g2, "vy", fld[:, 1], fuse=False)
        g2, ivz = add_point_data(g2, "vz", fld[:, 2], fuse=False)
        n_traj, max_steps = 1024, 256
        rng = np.random.default_rng(3)
        y0 = jnp.asarray(0.3 + 0.4 * rng.random((n_traj, 3)), g2.dtype)
        ttable = build_trace_table(g2, jnp.asarray((ivx, ivy, ivz)))

        def run(g, tt, y):
            return integrate_along_field(
                g, y, (ivx, ivy, ivz), nvar=0, min_dx=1e-4, max_dx=0.05,
                max_steps=max_steps, rtol=1e-3, atol=1e-3, trace_table=tt,
            )

        res = jax.jit(run)(g2, ttable, y0)
        total_pts = int(np.asarray(res.n_steps).clip(max=max_steps).sum())

        @jax.jit
        def chain(g, tt, y, n):
            def body(i, carry):
                y, _ = carry
                r = run(g, tt, y)
                return (y + 1e-12 * r.n_steps.astype(y.dtype)[:, None],
                        r.n_steps)

            return lax.fori_loop(0, n, body, (y, jnp.zeros(n_traj,
                                                           jnp.int32)))

        def fetch(s):
            return float(jnp.sum(s[0].ravel()[:1]))

        fetch(chain(g2, ttable, y0, 1))

        def timed(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fetch(chain(g2, ttable, y0, n))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = max((timed(4) - timed(1)) / 3, 1e-9)
        out["trace_steps_per_s"] = total_pts / dt
        out["trace_lines"] = n_traj
        out["trace_mean_steps"] = total_pts / n_traj

        try:
            from interpolate_unstructured_tpu.utils.serial_oracle import (
                serial_trace,
            )

            ns = 256
            best = float("inf")
            for _ in range(2):  # best-of-2: host timing jitters
                t0 = time.perf_counter()
                _, _, s_steps, _ = serial_trace(
                    pts, np.asarray(grid.cells), np.asarray(grid.neighbors),
                    fld, np.asarray(y0[:ns]), min_dx=1e-4, max_dx=0.05,
                    max_steps=max_steps, rtol=1e-3, atol=1e-3,
                )
                best = min(best, time.perf_counter() - t0)
            out["serial_trace_steps_per_s"] = (
                float(s_steps.clip(max=max_steps).sum()) / best
            )
            out["trace_speedup_vs_serial"] = (
                out["trace_steps_per_s"] / out["serial_trace_steps_per_s"]
            )
        except Exception as e:  # oracle build env
            print(f"# serial_trace unavailable: {e}", file=sys.stderr)
        del ttable
    except Exception as e:
        print(f"# trace_at_scale failed: {e}", file=sys.stderr)
    return out


def large_mesh():
    """10M cold queries on a ~1M-cell tet mesh (candidate-bin path).

    The grid is built once and round-tripped through save_grid /
    load_grid, proving the checkpoint path at scale and amortizing the
    host preprocessing across driver rounds.
    """
    import jax
    import jax.numpy as jnp

    from interpolate_unstructured_tpu import (
        build_grid,
        interpolate_scalar_at,
    )
    from interpolate_unstructured_tpu.io.checkpoint import load_grid, save_grid
    from interpolate_unstructured_tpu.utils import meshgen

    os.makedirs(CACHE_DIR, exist_ok=True)
    dtype_tag = "f64" if jax.config.jax_enable_x64 else "f32"
    cache = os.path.join(
        CACHE_DIR, f"tet{LARGE_N_SIDE}_{dtype_tag}.binda"
    )
    t0 = time.perf_counter()
    prep_split = {}
    if os.path.exists(cache):
        grid = load_grid(cache, resave_on_rebuild=True, timings=prep_split)
        prep_s = time.perf_counter() - t0
        prep_kind = "load_grid"
    else:
        points, cells, neighbors = meshgen.tet_box_mesh(
            LARGE_N_SIDE, LARGE_N_SIDE, LARGE_N_SIDE
        )
        grid = build_grid(
            points, cells, neighbors, "tetra",
            point_data={"Polynomial": points.sum(axis=1) + 1.0},
            locate_mode="walk",
        )
        save_grid(grid, cache)
        prep_s = time.perf_counter() - t0
        prep_kind = "build_grid+save"

    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.random((LARGE_N_QUERIES, 3)), grid.dtype)

    # Correctness gate: linear exactness + full found-ness on a slice
    vals, ic, found = jax.jit(
        lambda g, r: interpolate_scalar_at(g, r, 0, fill_value=0.0)
    )(grid, r[:1_000_000])
    f = np.asarray(found)
    assert f.all(), "all samples lie inside the unit box"
    err = float(
        np.abs(
            np.asarray(vals) - (np.asarray(r[:1_000_000]).sum(1) + 1.0)
        ).max()
    )
    tol = 1e-12 if grid.dtype == jnp.float64 else 5e-5
    assert err < tol, f"linear exactness broke: {err}"

    t_cold = chain_time(grid, r, n0=1, n1=6)

    trace_stats = trace_at_scale(grid)

    # Accurate (compensated-f32) mode: since round 4 the cold accurate
    # query is ONE locate-fused gather from df32-value-plane candidate
    # rows (ops/locate._candidates_query_df; built by prepare_accurate)
    # instead of locate + a second per-cell gather + the ~2k-flop df32
    # weight kernel.  The truth is evaluated in float64 AT the f32
    # query positions, so the <=1e-10 gate is exact without x64.
    from interpolate_unstructured_tpu import (
        interpolate_at_acc,
        prepare_accurate,
    )

    grid = prepare_accurate(grid)
    r1 = r[:1_000_000]

    def acc_query(g, rr, n):
        from jax import lax

        def body(i, carry):
            rr, acc = carry
            vh, vl, found, ic = interpolate_at_acc(g, rr, (0,))
            dep = rr + 1e-30 * vh[:, :1].astype(rr.dtype)
            return (dep, acc + vh[0, 0])

        _, acc = lax.fori_loop(0, n, body, (rr, jnp.zeros((), jnp.float32)))
        return acc

    jacc = jax.jit(acc_query, static_argnums=(2,))

    def timed_acc(n):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(jacc(grid, r1, n))
            best = min(best, time.perf_counter() - t0)
        return best

    float(jacc(grid, r1, 1))
    t_acc = max((timed_acc(6) - timed_acc(1)) / 5, 1e-9)

    vh, vl, found_a, ic_a = jax.jit(
        lambda g, rr: interpolate_at_acc(g, rr, (0,))
    )(grid, r1)
    assert bool(np.asarray(found_a).all())
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    truth = np.asarray(r1, np.float64).sum(axis=1) + 1.0
    acc_err = float(np.abs(got[:, 0] - truth).max())
    # Without stored f64 residuals (pre-v4 cache) accuracy is bounded
    # by the f32 mesh representation instead of the arithmetic.
    acc_tol = 1e-10 if grid.points_lo is not None else 5e-7
    assert acc_err < acc_tol, f"accurate mode drifted: {acc_err}"

    return {
        "large_mesh_cold_qps": LARGE_N_QUERIES / t_cold,
        "large_mesh_cells": grid.n_cells,
        "large_mesh_prep_s": prep_s,
        "large_mesh_prep": prep_kind,
        # phase split (VERDICT r3 item 8): checkpoint-read / candidate
        # rebuild (0 on a matching load) / device table repack incl.
        # any one-off pack-kernel compile
        "prep_read_s": prep_split.get("read_s"),
        "prep_rebuild_s": prep_split.get("rebuild_s"),
        "prep_tables_s": prep_split.get("tables_s"),
        "large_mesh_max_err": err,
        "accurate_qps": 1_000_000 / t_acc,
        "accurate_max_err": acc_err,
        **trace_stats,
    }


def main():
    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    toy = toy_protocol()
    big = large_mesh()

    print(
        f"# device={toy['device']} dtype={toy['dtype']} "
        f"cold={toy['cold_qps']:.3e} q/s warm={toy['warm_qps']:.3e} q/s "
        f"warm_walk={toy['warm_walk_qps']:.3e} q/s "
        f"max_err={toy['max_err']:.2e} | large-mesh "
        f"({big['large_mesh_cells']} cells) "
        f"cold={big['large_mesh_cold_qps']:.3e} q/s "
        f"prep={big['large_mesh_prep_s']:.1f}s ({big['large_mesh_prep']}) "
        f"accurate={big['accurate_qps']:.3e} q/s "
        f"(err {big['accurate_max_err']:.1e})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "cold_interpolation_queries_per_sec_per_chip",
                "value": toy["cold_qps"],
                "unit": "queries/s",
                "vs_baseline": toy["cold_qps"] / 1e8,
                "warm_qps": toy["warm_qps"],
                "warm_walk_qps": toy["warm_walk_qps"],
                # measured single-core denominators for the same
                # protocol on this host (benchmarks/serial_baseline.py):
                # numpy per-query walk (understates compiled code),
                # vectorized numpy brute-force (overstates the walk),
                # and the compiled C++ reference-algorithm oracle
                # (native/serial_oracle.cc — the faithful stand-in).
                # speedup_vs_serial divides by the FASTEST measured
                # denominator, so it is conservative.
                "serial_qps": toy["serial_qps"],
                "vectorized_cpu_qps": toy["vectorized_cpu_qps"],
                "compiled_serial_qps": toy["compiled_serial_qps"],
                "speedup_vs_serial": (
                    toy["cold_qps"]
                    / max(
                        toy["serial_qps"],
                        toy["vectorized_cpu_qps"],
                        toy["compiled_serial_qps"] or 0.0,
                    )
                ),
                "large_mesh_cold_qps": big["large_mesh_cold_qps"],
                "large_mesh_cells": big["large_mesh_cells"],
                "large_mesh_vs_baseline": big["large_mesh_cold_qps"] / 1e8,
                "prep_read_s": big["prep_read_s"],
                "prep_rebuild_s": big["prep_rebuild_s"],
                "prep_tables_s": big["prep_tables_s"],
                "accurate_qps": big["accurate_qps"],
                "accurate_max_err": big["accurate_max_err"],
                # tracer at scale (VERDICT r4 item 4): 1024 lines on
                # the ~1M-cell mesh with a prebuilt trace table, plus
                # the single-core compiled C++ denominator
                "trace_steps_per_s": big.get("trace_steps_per_s"),
                "serial_trace_steps_per_s": big.get(
                    "serial_trace_steps_per_s"
                ),
                "trace_speedup_vs_serial": big.get(
                    "trace_speedup_vs_serial"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
