"""Interpret-mode parity of the fused tracer round kernel.

The fused kernel (ops/pallas_trace.py) runs RK stages 2-4 of every
tracer iteration — walk rounds, arrival interpolation, and the stage
machine — in one Pallas program.  It must reproduce the generic XLA
path of trace.integrate_along_field: same step counts, same boundary
codes, same trajectories to float32 rounding.  On CPU the kernel runs
through the Pallas interpreter; on TPU the same code is the production
tracer engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.ops import pallas_trace
from interpolate_unstructured_tpu.trace import integrate_along_field
from interpolate_unstructured_tpu.utils import meshgen

TRACE_KW = dict(
    min_dx=1e-4, max_dx=0.1, max_steps=60, rtol=1e-3, atol=1e-3
)


def _circular_grid(cell_type):
    if cell_type == "triangle":
        pts, cells, nbrs = meshgen.triangle_rect_mesh(9, 8)
    else:
        pts, cells, nbrs = meshgen.quad_rect_mesh(9, 8)
    grid = iu.build_grid(
        pts, cells, nbrs, cell_type, dtype=jnp.float32
    )
    # (vx, vy) = (-y, x): circles around the origin
    p = np.asarray(grid.points)
    grid, i_vx = iu.add_point_data(grid, "vx", -p[:, 1])
    grid, i_vy = iu.add_point_data(grid, "vy", p[:, 0])
    return grid, (i_vx, i_vy)


def _tet_grid():
    pts, cells, nbrs = meshgen.tet_box_mesh(6, 6, 6)
    grid = iu.build_grid(pts, cells, nbrs, "tetra", dtype=jnp.float32)
    p = np.asarray(grid.points)
    # Helical field: rotation in (x, y) around the box center + lift
    grid, i_vx = iu.add_point_data(grid, "vx", 0.5 - p[:, 1])
    grid, i_vy = iu.add_point_data(grid, "vy", p[:, 0] - 0.5)
    grid, i_vz = iu.add_point_data(grid, "vz", np.full(len(p), 0.3))
    return grid, (i_vx, i_vy, i_vz)


def _run_both(monkeypatch, grid, i_field, y0, **kw):
    res_x = integrate_along_field(grid, y0, i_field, nvar=0, **kw)
    assert pallas_trace.supported(grid, None, 0) is False  # CPU tests
    monkeypatch.setattr(pallas_trace, "supported", lambda *a: True)
    res_p = integrate_along_field(grid, y0, i_field, nvar=0, **kw)
    monkeypatch.undo()
    return res_x, res_p


def _assert_parity(res_x, res_p, max_steps):
    n_x = np.asarray(res_x.n_steps)
    n_p = np.asarray(res_p.n_steps)
    np.testing.assert_array_equal(n_p, n_x)
    np.testing.assert_array_equal(
        np.asarray(res_p.boundary_material),
        np.asarray(res_x.boundary_material),
    )
    for b in range(len(n_x)):
        m = min(int(n_x[b]), max_steps)
        np.testing.assert_allclose(
            np.asarray(res_p.y[b, :m]),
            np.asarray(res_x.y[b, :m]),
            atol=5e-5,
            err_msg=f"trajectory {b}",
        )
        np.testing.assert_allclose(
            np.asarray(res_p.y_field[b, :m]),
            np.asarray(res_x.y_field[b, :m]),
            atol=5e-5,
            err_msg=f"field samples {b}",
        )


@pytest.mark.parametrize("cell_type", ["triangle", "quad"])
def test_fused_trace_parity_2d(monkeypatch, cell_type):
    grid, i_field = _circular_grid(cell_type)
    # Starts spanning interior circles and near-boundary exits; one
    # start outside the domain (invalid, n_steps == 1)
    y0 = jnp.asarray(
        [
            [1.5, 0.0],
            [0.5, 0.5],
            [1.0, 0.25],
            [1.9, 1.9],
            [-5.0, -5.0],
        ],
        jnp.float32,
    )
    res_x, res_p = _run_both(monkeypatch, grid, i_field, y0, **TRACE_KW)
    _assert_parity(res_x, res_p, TRACE_KW["max_steps"])
    # The fused path must still land the quarter circle on (0, 1.5)
    n = int(res_p.n_steps[0])
    assert n <= TRACE_KW["max_steps"]
    np.testing.assert_allclose(
        np.asarray(res_p.y[0, n - 1]), [0.0, 1.5], atol=2e-2
    )


def test_fused_trace_parity_3d(monkeypatch):
    grid, i_field = _tet_grid()
    y0 = jnp.asarray(
        [
            [0.3, 0.5, 0.1],
            [0.5, 0.2, 0.5],
            [0.9, 0.9, 0.05],
            [0.05, 0.05, 0.9],
        ],
        jnp.float32,
    )
    res_x, res_p = _run_both(monkeypatch, grid, i_field, y0, **TRACE_KW)
    _assert_parity(res_x, res_p, TRACE_KW["max_steps"])


def test_fused_trace_parity_reverse(monkeypatch):
    grid, i_field = _circular_grid("triangle")
    y0 = jnp.asarray([[1.5, 0.1], [0.75, 1.2]], jnp.float32)
    res_x, res_p = _run_both(
        monkeypatch, grid, i_field, y0, reverse=True, **TRACE_KW
    )
    _assert_parity(res_x, res_p, TRACE_KW["max_steps"])


def test_fused_trace_straggler_compaction_parity(monkeypatch):
    """The two-phase round loop (full width, then still-walking lanes
    compacted into a batch/divisor buffer) must be invisible in the
    results.  Shrunk tile/thresholds so the compacted phase actually
    runs at a CPU-testable batch size."""
    import dataclasses

    grid, i_field = _tet_grid()
    cfg = dataclasses.replace(
        grid.config,
        trace_tile=128,
        trace_compact_divisor=2,
        trace_compact_min_batch=256,
    )
    grid = dataclasses.replace(grid, config=cfg)
    rng = np.random.default_rng(5)
    y0 = jnp.asarray(0.2 + 0.6 * rng.random((256, 3)), jnp.float32)
    res_x, res_p = _run_both(monkeypatch, grid, i_field, y0, **TRACE_KW)
    _assert_parity(res_x, res_p, TRACE_KW["max_steps"])


def test_fused_supported_gates():
    grid, _ = _circular_grid("triangle")
    # CPU backend: never supported (production gate)
    assert not pallas_trace.supported(grid, None, 0)
    # Mask or extra ODE variables: unsupported regardless of backend
    assert not pallas_trace.supported(grid, 0, 0)
    assert not pallas_trace.supported(grid, None, 2)
