"""Pallas fused-kernel parity tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu.ops import interp, pallas_interp
from interpolate_unstructured_tpu.utils import meshgen


@pytest.mark.parametrize(
    "ctype,gen",
    [
        ("triangle", meshgen.triangle_rect_mesh),
        ("quad", meshgen.quad_rect_mesh),
    ],
)
def test_pallas_matches_xla_2d(ctype, gen):
    points, cells, neighbors = gen(4, 4)
    grid = iu.build_grid(
        points,
        cells,
        neighbors,
        ctype,
        point_data={
            "Polynomial": points.sum(1) + 1,
            "X": points[:, 0],
        },
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    # include out-of-domain points to exercise the found mask
    r = jnp.asarray(
        rng.random((500, 3)) * np.array([2.6, 2.6, 0.0]) - 0.3,
        jnp.float32,
    )
    iv = jnp.asarray([0, 1])
    v1, ic1, f1 = interp._interpolate_bruteforce(grid, r, iv)
    v2, ic2, f2 = pallas_interp.interpolate_bruteforce_pallas(
        grid, r, iv, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(ic1), np.asarray(ic2))
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(v1)),
        np.nan_to_num(np.asarray(v2)),
        atol=1e-6,
    )


def test_pallas_matches_xla_tetra():
    points, cells, neighbors = meshgen.tet_box_mesh(3, 3, 3)
    grid = iu.build_grid(
        points,
        cells,
        neighbors,
        "tetra",
        point_data={"Polynomial": points.sum(1) + 1},
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.random((500, 3)), jnp.float32)
    iv = jnp.asarray([0])
    v1, ic1, f1 = interp._interpolate_bruteforce(grid, r, iv)
    v2, ic2, f2 = pallas_interp.interpolate_bruteforce_pallas(
        grid, r, iv, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ic1), np.asarray(ic2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    # linear exactness at f32 tolerance
    exact = np.asarray(r).sum(1) + 1
    np.testing.assert_allclose(np.asarray(v2[:, 0]), exact, atol=1e-4)


def test_pallas_eligibility():
    points, cells, neighbors = meshgen.triangle_rect_mesh(2, 2)
    g32 = iu.build_grid(points, cells, neighbors, "triangle",
                        dtype=jnp.float32)
    assert pallas_interp.supported(g32, jnp.float32)
    assert not pallas_interp.supported(g32, jnp.float64)
