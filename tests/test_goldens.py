"""Committed golden values: pin the f64 CPU results of locate+interp
(100 fixed points per bundled mesh, every variable) and the tet-mesh
trace endpoint to <=1e-12 drift (BASELINE.json contract; generator and
provenance in tests/data/make_goldens.py)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.trace import integrate_along_field

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data", "goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS, allow_pickle=False)


def _check_mesh(grid, tag, goldens):
    names = tuple(str(s) for s in goldens[f"{tag}/var_names"])
    assert grid.point_data_names == names
    r = jnp.asarray(goldens[f"{tag}/r"])
    iv = jnp.arange(grid.n_point_data)
    vals, _, found = iu.interpolate_at(grid, r, iv)
    assert bool(found.all())
    got = np.asarray(vals)
    want = goldens[f"{tag}/values"]
    scale = np.maximum(np.abs(want), 1.0)
    np.testing.assert_array_less(
        np.abs(got - want) / scale, 1e-12,
        err_msg=f"{tag} drifted past 1e-12 vs committed goldens",
    )


def test_triangle_goldens(triangle_grid, goldens):
    _check_mesh(triangle_grid, "triangle", goldens)


def test_quad_goldens(quad_grid, goldens):
    qp = np.asarray(quad_grid.points)
    grid, _ = iu.add_point_data(
        quad_grid, "NonlinearXY",
        np.sin(qp[:, 0]) * np.cos(qp[:, 1]) + qp[:, 0] * qp[:, 1],
    )
    _check_mesh(grid, "quad", goldens)


def test_tetra_goldens(tetra_grid, goldens):
    _check_mesh(tetra_grid, "tetra", goldens)


def test_tetra_goldens_walk_mode(test_data_dir, goldens):
    """The walk/candidate locate path must agree with the committed
    (bruteforce-generated) values to the same tolerance."""
    grid = iu.read_grid(test_data_dir / "tetra.vtu", locate_mode="walk")
    _check_mesh(grid, "tetra", goldens)


def _helix_grid(test_data_dir):
    grid = iu.read_grid(test_data_dir / "tetra.vtu")
    pts = np.asarray(grid.points)
    grid, ivx = iu.add_point_data(grid, "vx", -(pts[:, 1] - 1.0))
    grid, ivy = iu.add_point_data(grid, "vy", pts[:, 0] - 1.0)
    grid, ivz = iu.add_point_data(grid, "vz", np.full(grid.n_points, 0.3))
    return grid, (ivx, ivy, ivz)


def test_tetra_trace_golden(test_data_dir, goldens):
    grid, i_field = _helix_grid(test_data_dir)
    min_dx, max_dx, max_steps, rtol, atol = goldens["tetra_trace/params"]
    res = integrate_along_field(
        grid, jnp.asarray(goldens["tetra_trace/y0"]),
        i_field, nvar=1,
        sub_int=lambda field, y: jnp.ones((1,), y.dtype),
        min_dx=float(min_dx), max_dx=float(max_dx),
        max_steps=int(max_steps), rtol=float(rtol), atol=float(atol),
    )
    n = int(res.n_steps[0])
    assert n == int(goldens["tetra_trace/n_steps"][0])
    assert int(res.boundary_material[0]) == -1
    y_end = np.asarray(res.y[0, n - 1])
    np.testing.assert_allclose(
        y_end, goldens["tetra_trace/y_end"], rtol=0, atol=1e-10,
        err_msg="tet trace endpoint drifted vs committed golden",
    )


def test_tetra_trace_mask_golden(test_data_dir, goldens):
    """Same helix terminated by an icell material change at z >= 1
    (m_interp_unstructured.f90:1055-1068, :1203-1215): the endpoint and
    step count are pinned to the committed f64 values."""
    grid, i_field = _helix_grid(test_data_dir)
    grid, imat = iu.add_icell_data(
        grid, "material", goldens["tetra_trace_mask/material"]
    )
    min_dx, max_dx, max_steps, rtol, atol = goldens["tetra_trace/params"]
    res = integrate_along_field(
        grid, jnp.asarray(goldens["tetra_trace/y0"]),
        i_field, nvar=1,
        sub_int=lambda field, y: jnp.ones((1,), y.dtype),
        i_icell_mask=imat, mask_value=0,
        min_dx=float(min_dx), max_dx=float(max_dx),
        max_steps=int(max_steps), rtol=float(rtol), atol=float(atol),
    )
    n = int(res.n_steps[0])
    assert n == int(goldens["tetra_trace_mask/n_steps"][0])
    assert int(res.boundary_material[0]) == 7
    y_end = np.asarray(res.y[0, n - 1])
    np.testing.assert_allclose(
        y_end, goldens["tetra_trace_mask/y_end"], rtol=0, atol=1e-10,
        err_msg="mask-terminated trace endpoint drifted vs golden",
    )
