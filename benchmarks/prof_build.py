"""Phase-profile of build_grid + save_grid on the 998k-cell tet mesh.

VERDICT r4 #3: build_grid was 302 s on this mesh (RESULTS.md grid-build
table) with no phase breakdown.  This prints where it goes so the cut
can target the real hotspot (host geometry? tunnel transfer? candidate
build? fused-row pack? checkpoint write?).

Usage: python benchmarks/prof_build.py [n_side] [--no-save]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np  # noqa: E402

from interpolate_unstructured_tpu import build_grid  # noqa: E402
from interpolate_unstructured_tpu.io.checkpoint import save_grid  # noqa: E402
from interpolate_unstructured_tpu.utils import meshgen  # noqa: E402


def main():
    n = 55
    for a in sys.argv[1:]:
        if a.isdigit():
            n = int(a)
    t0 = time.perf_counter()
    points, cells, neighbors = meshgen.tet_box_mesh(n, n, n)
    t_mesh = time.perf_counter() - t0
    print(f"meshgen ({len(cells)} cells): {t_mesh:7.1f} s", flush=True)

    timings = {}
    t0 = time.perf_counter()
    grid = build_grid(
        points, cells, neighbors, "tetra",
        point_data={"Polynomial": points.sum(axis=1) + 1.0},
        locate_mode="walk",
        timings=timings,
    )
    t_build = time.perf_counter() - t0
    for k, v in timings.items():
        print(f"  build_grid/{k:<18s} {v:7.1f} s", flush=True)
    print(f"build_grid total: {t_build:7.1f} s", flush=True)

    if "--no-save" not in sys.argv:
        t0 = time.perf_counter()
        save_grid(grid, "/tmp/prof_build_grid.binda")
        t_save = time.perf_counter() - t0
        sz = os.path.getsize("/tmp/prof_build_grid.binda") / 1e9
        print(f"save_grid: {t_save:7.1f} s ({sz:.2f} GB)", flush=True)
        os.remove("/tmp/prof_build_grid.binda")


if __name__ == "__main__":
    main()
