"""Fused accurate-mode query (df32 value planes in the candidate rows).

prepare_accurate on a simplex cover grid builds cand_df_table
(models/grid.build_cand_df_table); interpolate_at_acc then answers
locate AND ~1e-13 interpolation from one gather
(ops/locate._candidates_query_df).  Gates: agreement with the f64
reference path on NONLINEAR vertex data, exact handling of f64
queries, and outside-the-mesh misses.
"""

import numpy as np
import jax.numpy as jnp

from interpolate_unstructured_tpu import build_grid
from interpolate_unstructured_tpu.ops.interp import interpolate_at
from interpolate_unstructured_tpu.ops.interp_acc import (
    interpolate_at_acc,
    prepare_accurate,
)
from interpolate_unstructured_tpu.utils import meshgen


def _grids(nv=1):
    points, cells, neighbors = meshgen.tet_box_mesh(7, 7, 7)
    pts = np.asarray(points, np.float64)
    rng = np.random.default_rng(9)
    data = {
        f"D{i}": np.sin(3 * pts[:, 0] + i) * pts[:, 1]
        + rng.random(len(pts)) * 1e-3
        for i in range(nv)
    }
    g32 = build_grid(
        points, cells, neighbors, "tetra", point_data=data,
        locate_mode="walk", dtype=jnp.float32,
    )
    g64 = build_grid(
        points, cells, neighbors, "tetra", point_data=data,
        locate_mode="walk", dtype=jnp.float64,
    )
    return g32, g64


def test_fused_df_planes_match_f64():
    g32, g64 = _grids()
    g32 = prepare_accurate(g32)
    assert g32.cand_df_table is not None, "df-plane gate did not engage"

    rng = np.random.default_rng(1)
    q64 = 0.05 + rng.random((20_000, 3)) * 0.9
    vh, vl, found, ic = interpolate_at_acc(g32, q64, (0,))
    assert bool(np.asarray(found).all())
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)

    # Same cell assignment as the pre-existing accurate path (both
    # probe the identical int16-quantized margins)...
    from interpolate_unstructured_tpu.ops import locate as locate_mod

    r32 = jnp.asarray(q64, jnp.float32)
    ic_old, _ = locate_mod.get_cell(g32, r32)
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ic_old))

    # ...and df32-exact evaluation: the f64 interpolant of the SAME
    # cell agrees to ~1e-13.  (Locate is f32-grade on BOTH accurate
    # paths: within the quantization fuzz of a face a query may
    # resolve to the adjacent cell, whose interpolant differs by
    # O(fuzz * gradient jump) — that is the mode's documented
    # location contract, not an evaluation error.)
    from interpolate_unstructured_tpu.ops.interp import (
        interpolate_at_icell,
    )

    v_same = interpolate_at_icell(
        g64, jnp.asarray(q64), jnp.asarray([0]),
        jnp.maximum(jnp.asarray(np.asarray(ic)), 0),
    )
    err = np.abs(got[:, 0] - np.asarray(v_same)[:, 0]).max()
    assert err < 1e-12, f"fused accurate drift: {err}"

    # global sanity vs the fully-f64 pipeline (loose: cell assignment
    # may differ within the quantization fuzz)
    v_ref, _, f_ref = interpolate_at(
        g64, jnp.asarray(q64, jnp.float64), [0]
    )
    assert np.abs(got[:, 0] - np.asarray(v_ref)[:, 0]).max() < 1e-5


def test_fused_df_planes_outside_mesh():
    g32, _ = _grids()
    g32 = prepare_accurate(g32)
    q = np.array([[2.5, 0.5, 0.5], [-1.0, 0.2, 0.2], [0.5, 0.5, 0.5]])
    vh, vl, found, ic = interpolate_at_acc(g32, q, (0,))
    f = np.asarray(found)
    assert not f[0] and not f[1] and f[2]
    assert int(np.asarray(ic)[0]) < 0


def test_fused_df_planes_multivar():
    g32, g64 = _grids(nv=2)
    g32 = prepare_accurate(g32)
    if g32.cand_df_table is None:
        import pytest

        pytest.skip("fused capacity < 2 variables on this layout")
    rng = np.random.default_rng(4)
    q64 = 0.05 + rng.random((5_000, 3)) * 0.9
    vh, vl, found, ic = interpolate_at_acc(g32, q64, (0, 1))
    assert bool(np.asarray(found).all())
    v_ref, _, _ = interpolate_at(g64, jnp.asarray(q64, jnp.float64), [0, 1])
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    err = np.abs(got - np.asarray(v_ref)).max()
    assert err < 1e-10, f"multivar fused accurate drift: {err}"


def test_df_table_invalidated_on_mutation():
    """Mutating a fused variable must invalidate the df-plane rows
    (stale planes would silently return the OLD values); re-preparing
    rebuilds them against the new data."""
    import interpolate_unstructured_tpu as iu

    g32, _ = _grids()
    g32 = prepare_accurate(g32)
    assert g32.cand_df_table is not None

    # true f64 vertex positions (the stored f32 + residual split) —
    # data sampled at the f32-rounded coords would NOT be the linear
    # function of query space and drifts at f32 grade
    pts = np.asarray(g32.points, np.float64) + np.asarray(
        g32.points_lo, np.float64
    )
    g2 = iu.set_point_data(g32, 0, pts.sum(axis=1) + 2.0)
    assert g2.cand_df_table is None, "stale df planes survived mutation"

    g2 = prepare_accurate(g2)
    rng = np.random.default_rng(3)
    q = 0.05 + rng.random((2000, 3)) * 0.9
    vh, vl, found, ic = interpolate_at_acc(g2, q, (0,))
    assert bool(np.asarray(found).all())
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    truth = q.sum(axis=1) + 2.0
    err = np.abs(got[:, 0] - truth).max()
    assert err < 1e-12, f"rebuilt df planes drifted: {err}"


def test_prepare_accurate_build_df_opt_out():
    """prepare_accurate(build_df=False) skips the df-plane table (the
    host plane solve + ~1.3x candidate-table bytes) for at-known-cell
    callers; interpolate_at_acc still answers correctly through the
    locate + acc_table path, and a later default call adds the table."""
    g32, _ = _grids()
    g = prepare_accurate(g32, build_df=False)
    assert g.acc_table is not None
    assert g.cand_df_table is None

    rng = np.random.default_rng(5)
    q = 0.05 + rng.random((2000, 3)) * 0.9
    vh, vl, found, ic = interpolate_at_acc(g, q, (0,))
    assert bool(np.asarray(found).all())
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)

    g_df = prepare_accurate(g)  # upgrades in place (acc_table reused)
    assert g_df.cand_df_table is not None
    vh2, vl2, found2, ic2 = interpolate_at_acc(g_df, q, (0,))
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ic2))
    got2 = np.asarray(vh2, np.float64) + np.asarray(vl2, np.float64)
    np.testing.assert_allclose(got, got2, atol=1e-12)
