"""Phase-profile of load_grid on the 998k-cell checkpoint.

VERDICT r4 #3: prep_tables_s was 14.3 s in BENCH_r04 with no internal
split.  This builds the bench cache if missing, then profiles a fresh
load twice (cold + warm process-local caches) and splits ``tables_s``
into walk-table assembly vs candidate-row pack by timing them
separately.

Usage: python benchmarks/prof_load.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import dataclasses  # noqa: E402

import jax  # noqa: E402

from interpolate_unstructured_tpu import build_grid  # noqa: E402
from interpolate_unstructured_tpu.io.checkpoint import (  # noqa: E402
    load_grid,
    save_grid,
)
from interpolate_unstructured_tpu.utils import meshgen  # noqa: E402

CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "cache", "tet55_f32.binda"
)


def main():
    if not os.path.exists(CACHE):
        os.makedirs(os.path.dirname(CACHE), exist_ok=True)
        points, cells, neighbors = meshgen.tet_box_mesh(55, 55, 55)
        t0 = time.perf_counter()
        grid = build_grid(
            points, cells, neighbors, "tetra",
            point_data={"Polynomial": points.sum(axis=1) + 1.0},
            locate_mode="walk",
        )
        print(f"build_grid: {time.perf_counter() - t0:6.1f} s", flush=True)
        t0 = time.perf_counter()
        save_grid(grid, CACHE)
        print(f"save_grid:  {time.perf_counter() - t0:6.1f} s", flush=True)
        del grid

    grid = None
    for tag in ("run1", "run2"):
        # the previous grid's ~3 GB cand_table must die before the next
        # load, or two live tables OOM the device
        del grid
        grid = None
        timings = {}
        t0 = time.perf_counter()
        grid = load_grid(CACHE, timings=timings)
        total = time.perf_counter() - t0
        print(
            f"{tag}: total {total:6.1f} s | read {timings['read_s']:.1f}"
            f" rebuild {timings['rebuild_s']:.1f}"
            f" tables {timings['tables_s']:.1f}",
            flush=True,
        )

    # Split tables_s: walk table vs candidate pack, measured on the
    # already-resident grid (transfers no longer folded in).
    from interpolate_unstructured_tpu.models.grid import (
        _build_cand_tables,
        _build_walk_table,
    )

    # drop the resident 3 GB table so the re-pack below has room
    grid = dataclasses.replace(
        grid, cand_table=None, cand_ext_table=None, walk_table=None
    )

    for name, fn in (
        ("walk_table", lambda: _build_walk_table(grid)),
        ("cand_pack", lambda: _build_cand_tables(grid)["cand_table"]),
    ):
        fn()  # warm (compiles cached, inputs resident)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:<12s} {best:6.2f} s (resident inputs)", flush=True)

    # And the transfer share: re-upload the raw leaves once, timed.
    import numpy as np
    import jax.numpy as jnp

    host = {
        f.name: np.asarray(getattr(grid, f.name))
        for f in dataclasses.fields(grid)
        if f.name in (
            "points", "cells", "neighbors", "cell_points", "face_normals",
            "face_offsets", "cell_volume", "point_data", "cand_ids",
            "cand_count",
        )
    }
    nbytes = sum(a.nbytes for a in host.values())
    t0 = time.perf_counter()
    dev = {k: jnp.asarray(v) for k, v in host.items()}
    jax.block_until_ready(list(dev.values()))
    dt = time.perf_counter() - t0
    print(
        f"  h2d transfer {dt:6.2f} s ({nbytes / 1e9:.2f} GB, "
        f"{nbytes / dt / 1e6:.0f} MB/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
