"""Interpret-mode parity of the Pallas walk-round kernel.

The kernel (ops/pallas_walk.py) must reproduce walk()'s XLA body
exactly — same cells, same statuses, same final positions, same step
counts — including backtrack-guard and boundary-exit cases.  On CPU it
runs through the Pallas interpreter; on TPU the same code is the
production warm-walk/tracer engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.ops import locate, pallas_walk
from interpolate_unstructured_tpu.utils import meshgen


@pytest.mark.parametrize("cell_type", ["tetra", "triangle"])
def test_pallas_walk_matches_xla(monkeypatch, cell_type):
    if cell_type == "tetra":
        pts, cells, nbrs = meshgen.tet_box_mesh(5, 5, 5)
    else:
        pts, cells, nbrs = meshgen.triangle_rect_mesh(7, 6)
    grid = iu.build_grid(
        pts, cells, nbrs, cell_type,
        point_data={"Polynomial": pts.sum(1) + 1.0},
        locate_mode="walk", dtype=jnp.float32,
    )

    rng = np.random.default_rng(11)
    b = 1500  # not a tile multiple: exercises lane padding
    ic0 = jnp.asarray(rng.integers(0, grid.n_cells, b), jnp.int32)
    r0 = np.asarray(grid.cell_points)[np.asarray(ic0)].mean(axis=1)
    lo, hi = np.asarray(grid.rmin), np.asarray(grid.rmax)
    # targets inside, outside, and degenerate (r1 == r0)
    r1 = lo - 0.2 * (hi - lo) + rng.random((b, 3)) * 1.4 * (hi - lo)
    r1[: b // 8] = r0[: b // 8]
    if cell_type == "triangle":
        r1[:, 2] = 0.0
    r0 = jnp.asarray(r0, jnp.float32)
    r1 = jnp.asarray(r1, jnp.float32)

    ic_x, rp_x, st_x, status_x = jax.jit(
        lambda g, r0, r1, ic0: locate.walk(g, r0, r1, ic0)
    )(grid, r0, r1, ic0)

    monkeypatch.setattr(
        pallas_walk, "supported", lambda *a: True
    )
    ic_p, rp_p, st_p, status_p = jax.jit(
        lambda g, r0, r1, ic0: locate.walk(g, r0, r1, ic0)
    )(grid, r0, r1, ic0)

    np.testing.assert_array_equal(np.asarray(ic_p), np.asarray(ic_x))
    np.testing.assert_array_equal(
        np.asarray(status_p), np.asarray(status_x)
    )
    np.testing.assert_array_equal(np.asarray(st_p), np.asarray(st_x))
    # positions agree to FMA-association ulps (the kernel fuses the
    # advance multiply-adds differently than XLA's elementwise chain)
    np.testing.assert_allclose(
        np.asarray(rp_p), np.asarray(rp_x), rtol=0, atol=4e-6
    )
