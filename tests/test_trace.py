"""Field-line tracer tests (test_trace_field.f90 scenario + extensions).

Circular field (vx, vy) = (-y, x) on the triangle fixture: a trace from
(1.5, 0) follows the radius-1.5 circle counterclockwise and exits the
[0,2]^2 domain at (0, 1.5) after a quarter turn; with the extra ODE
dl/ds = 1 started at -0.75*pi, the accumulated arc length lands near 0
(test_trace_field.f90:41-44).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.trace import (
    BM_NOT_REACHED,
    integrate_along_field,
)


@pytest.fixture(scope="module")
def circular_grid(test_data_dir):
    grid = iu.read_grid(test_data_dir / "triangle.vtu")
    pts = np.asarray(grid.points)
    grid, i_vx = iu.add_point_data(grid, "vx", -pts[:, 1])
    grid, i_vy = iu.add_point_data(grid, "vy", pts[:, 0])
    return grid, (i_vx, i_vy)


TRACE_KW = dict(
    min_dx=1e-5, max_dx=0.1, max_steps=100, rtol=1e-3, atol=1e-3
)


def test_trace_circular_field(circular_grid):
    grid, i_field = circular_grid

    def sub_int(field, y):
        return jnp.ones(1, dtype=y.dtype)  # dl/ds = 1 (arc length)

    y0 = jnp.asarray([[1.5, 0.0, -0.75 * np.pi]])
    res = integrate_along_field(
        grid, y0, i_field, nvar=1, sub_int=sub_int, **TRACE_KW
    )
    n = int(res.n_steps[0])
    assert n <= TRACE_KW["max_steps"], "Boundary not reached"
    assert n > 3
    final = np.asarray(res.y[0, n - 1])
    # Quarter circle: exits at (0, 1.5) with total arc length 0.75*pi
    assert abs(final[2]) < 2e-2, f"arc length residual {final[2]}"
    np.testing.assert_allclose(final[:2], [0.0, 1.5], atol=2e-2)
    assert int(res.boundary_material[0]) == -1  # physical boundary

    # Curve points stay on the circle of radius 1.5 (RK23 at tol 1e-3)
    r = np.linalg.norm(np.asarray(res.y[0, :n, :2]), axis=1)
    np.testing.assert_allclose(r, 1.5, atol=5e-3)

    # Field samples along the curve match the exact field
    yf = np.asarray(res.y_field[0, :n])
    ypos = np.asarray(res.y[0, :n, :2])
    np.testing.assert_allclose(yf[:, 0], -ypos[:, 1], atol=1e-12)
    np.testing.assert_allclose(yf[:, 1], ypos[:, 0], atol=1e-12)


def test_trace_golden_quarter_circle(circular_grid):
    """Analytic golden at tight tolerance (f64): the quarter-circle
    trace must land on (0, 1.5) with arc length 0.75*pi to ~1e-6 —
    the high-precision stand-in for cross-validation against the
    unbuildable Fortran binaries (BASELINE.md)."""
    grid, i_field = circular_grid
    assert grid.dtype == jnp.float64

    def sub_int(field, y):
        return jnp.ones(1, dtype=y.dtype)

    y0 = jnp.asarray([[1.5, 0.0, 0.0]])
    res = integrate_along_field(
        grid,
        y0,
        i_field,
        nvar=1,
        sub_int=sub_int,
        min_dx=1e-9,
        max_dx=0.05,
        max_steps=4000,
        rtol=1e-10,
        atol=1e-10,
    )
    n = int(res.n_steps[0])
    assert n <= 4000, "boundary not reached"
    final = np.asarray(res.y[0, n - 1])
    # Exit point on the x=0 wall and accumulated arc length = 0.75*pi
    np.testing.assert_allclose(final[:2], [0.0, 1.5], atol=1e-6)
    np.testing.assert_allclose(final[2], 0.75 * np.pi, atol=1e-6)
    # Every accepted point sits on the radius-1.5 circle
    rr = np.linalg.norm(np.asarray(res.y[0, :n, :2]), axis=1)
    np.testing.assert_allclose(rr, 1.5, atol=1e-7)


def test_trace_reverse_exits_immediately(circular_grid):
    grid, i_field = circular_grid
    # Reversed (clockwise) from (1.5, 0.1): leaves through y=0 quickly
    y0 = jnp.asarray([[1.5, 0.1]])
    res = integrate_along_field(
        grid, y0, i_field, nvar=0, reverse=True, **TRACE_KW
    )
    n = int(res.n_steps[0])
    assert n <= TRACE_KW["max_steps"]
    final = np.asarray(res.y[0, n - 1])
    assert final[1] < 0.12  # moved down toward the boundary
    assert int(res.boundary_material[0]) == -1


def test_trace_batch(circular_grid):
    grid, i_field = circular_grid
    starts = np.array(
        [[1.5, 0.0], [0.5, 0.5], [1.0, 0.25], [1.9, 1.9]], dtype=float
    )
    res = integrate_along_field(
        grid, jnp.asarray(starts), i_field, nvar=0, **TRACE_KW
    )
    assert res.y.shape == (4, 100, 2)
    assert res.y_field.shape == (4, 100, 2)
    # All traces either hit the boundary or fill the buffer
    for b in range(4):
        n = int(res.n_steps[b])
        if n <= TRACE_KW["max_steps"]:
            assert int(res.boundary_material[b]) == -1
        else:
            assert int(res.boundary_material[b]) == BM_NOT_REACHED
        # Trajectory preserves its circle radius while inside
        m = min(n, TRACE_KW["max_steps"])
        r = np.linalg.norm(np.asarray(res.y[b, :m, :2]), axis=1)
        np.testing.assert_allclose(
            r, np.linalg.norm(starts[b]), atol=6e-3
        )


def test_trace_invalid_start(circular_grid):
    grid, i_field = circular_grid
    y0 = jnp.asarray([[-5.0, -5.0]])  # outside the domain
    res = integrate_along_field(grid, y0, i_field, nvar=0, **TRACE_KW)
    assert int(res.n_steps[0]) == 1
    assert int(res.boundary_material[0]) == -1


def test_trace_mask_region(test_data_dir):
    """Integration restricted to a mask region stops at the material
    change and reports the entered cell's mask value."""
    grid = iu.read_grid(test_data_dir / "triangle.vtu")
    pts = np.asarray(grid.points)
    grid, i_vx = iu.add_point_data(grid, "vx", np.ones(grid.n_points))
    grid, i_vy = iu.add_point_data(grid, "vy", np.zeros(grid.n_points))
    # Material 0 for cells with center x < 1, else 7
    centers = np.asarray(grid.cell_centers())
    mat = np.where(centers[:, 0] < 1.0, 0, 7).astype(np.int32)
    grid, i_mat = iu.add_icell_data(grid, "material", mat)

    y0 = jnp.asarray([[0.25, 0.5]])  # inside material 0, field +x
    res = integrate_along_field(
        grid,
        y0,
        (i_vx, i_vy),
        nvar=0,
        i_icell_mask=i_mat,
        mask_value=0,
        **TRACE_KW,
    )
    n = int(res.n_steps[0])
    assert n <= TRACE_KW["max_steps"]
    final = np.asarray(res.y[0, n - 1])
    # Stops at the x=1 material interface, not the x=2 domain boundary
    assert final[0] < 1.0 + 1e-6
    assert int(res.boundary_material[0]) == 7  # material entered

    # Starting inside the wrong material exits immediately
    y0b = jnp.asarray([[1.5, 0.5]])
    resb = integrate_along_field(
        grid,
        y0b,
        (i_vx, i_vy),
        nvar=0,
        i_icell_mask=i_mat,
        mask_value=0,
        **TRACE_KW,
    )
    assert int(resb.n_steps[0]) == 1
    assert int(resb.boundary_material[0]) == 7


def test_write_trace_vtk(tmp_path, triangle_grid):
    """Trace polyline export round-trips through the VTU reader."""
    import numpy as np
    from interpolate_unstructured_tpu import add_point_data
    from interpolate_unstructured_tpu.trace import (
        integrate_along_field, write_trace_vtk,
    )

    grid = triangle_grid
    pts = np.asarray(grid.points)
    grid, ivx = add_point_data(grid, "wvx", -(pts[:, 1] - 1.0))
    grid, ivy = add_point_data(grid, "wvy", pts[:, 0] - 1.0)
    y0 = jnp.asarray([[1.3, 1.0, 0.0], [1.2, 1.0, 0.0]])
    res = integrate_along_field(
        grid, y0, (ivx, ivy), nvar=1,
        sub_int=lambda f, y: jnp.ones(1),
        min_dx=1e-5, max_dx=0.05, max_steps=16, rtol=1e-3, atol=1e-3,
    )
    fn = tmp_path / "traces.vtu"
    write_trace_vtk(res, fn)

    # Parse with the low-level VTU helpers (read_vtu's Mesh model is
    # fixed-width cells; polylines are variable-width)
    from xml.etree import ElementTree
    from interpolate_unstructured_tpu.io.vtu import (
        _VTK_TO_NP, _decode_block, _split_appended_blob,
    )

    xml_text, blob, _ = _split_appended_blob(fn.read_bytes())
    root = ElementTree.fromstring(xml_text)
    arrays = {}
    for da in root.iter("DataArray"):
        off = int(da.get("offset"))
        raw = _decode_block(blob[off:], np.uint32, False)
        arrays[da.get("Name")] = np.frombuffer(
            raw, dtype=_VTK_TO_NP[da.get("type")]
        )

    n = np.minimum(np.asarray(res.n_steps), 16)
    points = arrays["Points"].reshape(-1, 3)
    assert len(points) == int(n.sum())
    np.testing.assert_array_equal(arrays["types"], [4, 4])
    np.testing.assert_array_equal(arrays["offsets"], np.cumsum(n))
    # first vertex of each polyline is its seed
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    np.testing.assert_allclose(
        points[starts, :2], np.asarray(y0)[:, :2], atol=1e-6
    )
    # arc-length variable rides along and increases
    var0 = arrays["var0"]
    assert (np.diff(var0[: int(n[0])]) > 0).all()
    np.testing.assert_array_equal(np.unique(arrays["trajectory"]), [0, 1])


def test_trace_step_cap_reports_sentinel():
    """A sub-step walk that hits config.trace_walk_max_steps even at
    dx ~ min_dx is a walk-budget artifact (the reference walks
    unbounded, :431): it must terminate with BM_STEP_CAP, never
    masquerade as a physical boundary (-1) mid-domain."""
    from interpolate_unstructured_tpu.trace import BM_STEP_CAP
    from interpolate_unstructured_tpu.utils.meshgen import (
        triangle_rect_mesh,
    )
    from interpolate_unstructured_tpu.utils.config import IUConfig

    points, cells, neighbors = triangle_rect_mesh(16, 16)
    pts = np.asarray(points)
    grid = iu.build_grid(
        pts, cells, neighbors, "triangle",
        point_data={"vx": np.ones(pts.shape[0]),
                    "vy": np.zeros(pts.shape[0])},
        locate_mode="walk",
        config=IUConfig(trace_walk_max_steps=2),
    )
    # min_dx = 0.5 crosses ~8 cells of size 0.125 — every walk caps
    res = integrate_along_field(
        grid, jnp.asarray([[0.2, 1.0]]), (0, 1),
        min_dx=0.5, max_dx=0.5, max_steps=50, rtol=1e-3, atol=1e-3,
    )
    assert int(res.boundary_material[0]) == BM_STEP_CAP
    # the same trace with a sane cap reaches the x=2 wall
    grid2 = iu.build_grid(
        pts, cells, neighbors, "triangle",
        point_data={"vx": np.ones(pts.shape[0]),
                    "vy": np.zeros(pts.shape[0])},
        locate_mode="walk",
    )
    res2 = integrate_along_field(
        grid2, jnp.asarray([[0.2, 1.0]]), (0, 1),
        min_dx=1e-5, max_dx=0.5, max_steps=50, rtol=1e-3, atol=1e-3,
    )
    assert int(res2.boundary_material[0]) == -1
    n = int(res2.n_steps[0])
    final = np.asarray(res2.y[0, n - 1])
    assert final[0] > 1.99


def test_trace_zero_field_terminates():
    """A zero interpolated field (stagnation point) must not produce
    NaN derivatives and spin the batch to max_iterations: the guarded
    unit vector steps the lane in place until the buffer fills
    (BM_NOT_REACHED) — the reference divides by zero here (:1199)."""
    from interpolate_unstructured_tpu.trace import BM_NOT_REACHED
    from interpolate_unstructured_tpu.utils.meshgen import (
        triangle_rect_mesh,
    )

    points, cells, neighbors = triangle_rect_mesh(6, 5)
    pts = np.asarray(points)
    zero = np.zeros(pts.shape[0])
    grid = iu.build_grid(
        pts, cells, neighbors, "triangle",
        point_data={"vx": zero, "vy": zero}, locate_mode="walk",
    )
    res = integrate_along_field(
        grid, jnp.asarray([[1.0, 1.0]]), (0, 1),
        min_dx=1e-5, max_dx=0.1, max_steps=10, rtol=1e-3, atol=1e-3,
    )
    assert int(res.boundary_material[0]) == BM_NOT_REACHED
    assert int(res.n_steps[0]) == 11  # buffer filled in place
    # finite positions, no NaN poisoning
    assert np.isfinite(np.asarray(res.y[0])).all()
    # terminated via the overflow path, not the iteration cap
    assert int(res.n_iterations[0]) <= 60


def test_trace_prebuilt_table_matches_inline(circular_grid):
    """trace_table= with a prebuilt build_trace_table result is exactly
    the inline-assembled path (round 5: repeated traces over one field
    prebuild the table once; at 1M cells inline assembly dominated
    small-bundle cost)."""
    grid, i_field = circular_grid
    y0 = jnp.asarray([[1.5, 0.0], [0.5, 0.5], [1.0, 1.9]])
    ref = integrate_along_field(grid, y0, i_field, **TRACE_KW)
    tt = iu.build_trace_table(grid, jnp.asarray(i_field))
    got = integrate_along_field(
        grid, y0, i_field, trace_table=tt, **TRACE_KW
    )
    np.testing.assert_array_equal(
        np.asarray(ref.n_steps), np.asarray(got.n_steps)
    )
    np.testing.assert_array_equal(np.asarray(ref.y), np.asarray(got.y))
    np.testing.assert_array_equal(
        np.asarray(ref.boundary_material),
        np.asarray(got.boundary_material),
    )
