"""Two-phase walk compaction tests: force the compacted-straggler path
with a tiny threshold and verify results match the single-phase walk."""

import jax.numpy as jnp
import numpy as np

import interpolate_unstructured_tpu as iu
from interpolate_unstructured_tpu import IUConfig
from interpolate_unstructured_tpu.utils import meshgen


def _grids():
    points, cells, neighbors = meshgen.triangle_rect_mesh(10, 10)
    kw = dict(point_data={"Polynomial": points.sum(1) + 1})
    # Compaction forced: phase1 = 1 step, compact at any batch size
    cfg = IUConfig(
        walk_phase1_steps=1,
        walk_compact_min_batch=1,
        walk_compact_divisor=4,
        bins_per_cell=0.25,  # coarse bins -> long walks -> stragglers
        use_candidate_bins=False,  # this test targets the walk phases
    )
    g_two = iu.build_grid(
        points, cells, neighbors, "triangle",
        locate_mode="walk", config=cfg, **kw,
    )
    # Single-phase reference (no compaction: max batch threshold huge)
    cfg1 = IUConfig(
        walk_compact_min_batch=1 << 60,
        bins_per_cell=0.25,
        use_candidate_bins=False,
    )
    g_one = iu.build_grid(
        points, cells, neighbors, "triangle",
        locate_mode="walk", config=cfg1, **kw,
    )
    return g_two, g_one


def test_compacted_walk_matches_single_phase():
    g_two, g_one = _grids()
    rng = np.random.default_rng(21)
    # Mix of inside and outside points
    r = jnp.asarray(
        rng.random((4096, 3)) * np.array([2.8, 2.8, 0.0])
        - np.array([0.4, 0.4, 0.0])
    )
    ic2, f2 = iu.get_cell(g_two, r)
    ic1, f1 = iu.get_cell(g_one, r)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    # Found queries must land in a containing cell in both modes
    np.testing.assert_array_equal(
        np.asarray(iu.point_is_inside_cell(g_two, r, ic2) & f2),
        np.asarray(f2),
    )
    v2, _, _ = iu.interpolate_scalar_at(g_two, r, 0)
    exact = np.asarray(r).sum(1) + 1
    inside = np.asarray(f2)
    np.testing.assert_allclose(
        np.asarray(v2)[inside], exact[inside], atol=1e-12
    )


def test_compacted_walk_overflow_fallback():
    """When more queries than the compact buffer remain active, the
    full-batch fallback branch must produce identical results."""
    points, cells, neighbors = meshgen.triangle_rect_mesh(10, 10)
    cfg = IUConfig(
        walk_phase1_steps=1,
        walk_compact_min_batch=1,
        walk_compact_divisor=1 << 20,  # m tiny relative to active count
        bins_per_cell=0.1,
        use_candidate_bins=False,  # this test targets the walk phases
    )
    grid = iu.build_grid(
        points, cells, neighbors, "triangle",
        point_data={"Polynomial": points.sum(1) + 1},
        locate_mode="walk", config=cfg,
    )
    rng = np.random.default_rng(22)
    r = jnp.asarray(rng.random((2048, 3)) * np.array([2.0, 2.0, 0.0]))
    ic, found = iu.get_cell(grid, r)
    assert bool(found.all())
    assert bool(iu.point_is_inside_cell(grid, r, ic).all())
