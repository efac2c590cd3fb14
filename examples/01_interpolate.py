"""Basic usage: build a grid, interpolate point data at query points.

Mirrors the reference's test_triangle.f90 flow (load mesh -> cold
interpolation -> warm re-query) with an in-memory mesh so the example is
self-contained.  Run with `python examples/01_interpolate.py`; add
JAX_PLATFORMS=cpu to force CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.io.convert import get_cell_neighbors


def unit_square_triangulation(n: int):
    """Structured (n x n) triangulation of the unit square."""
    xs = np.linspace(0.0, 1.0, n + 1)
    px, py = np.meshgrid(xs, xs, indexing="ij")
    points = np.column_stack([px.ravel(), py.ravel(), np.zeros(px.size)])
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    v00 = (i * (n + 1) + j).ravel()
    v10, v01 = v00 + (n + 1), v00 + 1
    v11 = v10 + 1
    cells = np.concatenate(
        [np.stack([v00, v10, v11], 1), np.stack([v00, v11, v01], 1)]
    )
    return points, cells


def main():
    points, cells = unit_square_triangulation(32)
    neighbors = get_cell_neighbors(cells, points, n_points_face=2)
    grid = iu.build_grid(
        points,
        cells,
        neighbors,
        "triangle",
        # any linear function is reproduced exactly by the kernels
        point_data={"Polynomial": points[:, 0] + points[:, 1] + 1.0},
    )
    i_var = iu.get_point_data_index(grid, "Polynomial")

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0.05, 0.95, size=(100_000, 3)) * [1, 1, 0])

    # Cold pass: no cell guesses (benchmark.f90:44-51 protocol)
    values, i_cell, found = iu.interpolate_scalar_at(grid, r, i_var)
    exact = r[:, 0] + r[:, 1] + 1.0
    print(
        f"cold: {int(found.sum())}/{len(r)} found, "
        f"max |err| = {float(jnp.abs(values - exact).max()):.3e}"
    )

    # Warm pass: advect the points slightly and reuse the found cells as
    # guesses (benchmark.f90:57-65 protocol)
    r2 = r + jnp.asarray([0.003, -0.002, 0.0])
    values2, _, found2 = iu.interpolate_scalar_at(grid, r2, i_var, guess=i_cell)
    exact2 = r2[:, 0] + r2[:, 1] + 1.0
    print(
        f"warm: {int(found2.sum())}/{len(r2)} found, "
        f"max |err| = {float(jnp.abs(values2 - exact2).max()):.3e}"
    )

    # Queries outside the domain report found=False (the reference's
    # silent miss, made explicit) and take fill_value.
    outside = jnp.asarray([[2.0, 2.0, 0.0]])
    v, _, f = iu.interpolate_scalar_at(grid, outside, i_var, fill_value=-1.0)
    print(f"outside query: found={bool(f[0])}, value={float(v[0])}")


if __name__ == "__main__":
    main()
