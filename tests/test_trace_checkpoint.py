"""Tracing on a checkpoint-loaded grid (BASELINE config 5 at test
scale; the bench runs the same path on the ~1M-cell mesh).

The reference workload (m_interp_unstructured.f90:987-1217) traces on
whatever grid the caller loaded; this pins that a grid round-tripped
through save_grid/load_grid traces BIT-IDENTICALLY to the freshly
built one (same fused trace table, same RK23 control flow).
"""

import numpy as np
import jax.numpy as jnp

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.io.checkpoint import load_grid, save_grid
from interpolate_unstructured_tpu.trace import integrate_along_field
from interpolate_unstructured_tpu.utils import meshgen


def _field_grid():
    points, cells, neighbors = meshgen.tet_box_mesh(10, 10, 10)
    pts = np.asarray(points)
    cx = pts[:, :2] - 0.5
    grid = iu.build_grid(
        points, cells, neighbors, "tetra",
        point_data={
            "vx": -cx[:, 1],
            "vy": cx[:, 0],
            "vz": np.full(len(pts), 0.25),
        },
        locate_mode="walk",
    )
    return grid


def test_trace_on_loaded_checkpoint(tmp_path):
    grid = _field_grid()
    fn = str(tmp_path / "tet10.binda")
    save_grid(grid, fn)
    loaded = load_grid(fn)

    rng = np.random.default_rng(5)
    y0 = jnp.asarray(0.3 + 0.4 * rng.random((64, 3)), grid.dtype)
    kw = dict(
        min_dx=1e-4, max_dx=0.05, max_steps=128, rtol=1e-3, atol=1e-3
    )
    res_a = integrate_along_field(grid, y0, (0, 1, 2), **kw)
    res_b = integrate_along_field(loaded, y0, (0, 1, 2), **kw)

    np.testing.assert_array_equal(
        np.asarray(res_a.n_steps), np.asarray(res_b.n_steps)
    )
    np.testing.assert_array_equal(
        np.asarray(res_a.y), np.asarray(res_b.y)
    )
    np.testing.assert_array_equal(
        np.asarray(res_a.boundary_material),
        np.asarray(res_b.boundary_material),
    )
    # sanity: the helix actually goes somewhere and stays inside
    n = np.asarray(res_a.n_steps)
    assert (n > 3).all()
