"""Cross-path agreement of the shared weight kernels (ops/wkern.py).

Round 2 found the quad ``denom == 0`` guard drifting between
hand-synchronized kernel copies; the kernels are now one definition,
and this test pins the contract: every plain-layout adapter produces
BIT-IDENTICAL weights (they are the same expressions over component
slices), degenerate inputs stay finite on every path, and the df32
trait agrees with a float64 evaluation of the same formula.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from interpolate_unstructured_tpu.ops import wkern
from interpolate_unstructured_tpu.ops import interp as interp_mod
from interpolate_unstructured_tpu.ops.locate import _quad_weights_c


def _quad_cases(dtype):
    """Quads exercising every branch: generic, parallelogram (linear
    fallback), qb < 0 root, sliver, and fully degenerate (all vertices
    coincident — the reference divides by zero here, :632)."""
    quads = np.array(
        [
            # generic convex quad
            [[0, 0, 0], [1.1, 0.1, 0], [1.3, 1.2, 0], [-0.1, 0.9, 0]],
            # exact parallelogram: qa == 0 -> linear fallback
            [[0, 0, 0], [1, 0, 0], [1.5, 1, 0], [0.5, 1, 0]],
            # near-parallelogram sliver (qa ~ rounding of b3)
            [[0, 0, 0], [1, 0, 0], [1.5 + 1e-7, 1e-3, 0], [0.5, 1e-3, 0]],
            # reflex-ish quad driving qb < 0
            [[0, 0, 0], [2, 0, 0], [0.1, 0.1, 0], [0, 2, 0]],
            # fully degenerate: all vertices coincident
            [[0.3, 0.4, 0], [0.3, 0.4, 0], [0.3, 0.4, 0], [0.3, 0.4, 0]],
        ],
        dtype=np.float64,
    )
    queries = np.array(
        [
            [0.55, 0.5, 0.0],
            [0.75, 0.5, 0.0],
            [0.75, 0.5, 0.0],
            [0.5, 0.5, 0.0],
            [0.3, 0.4, 0.0],
        ],
        dtype=np.float64,
    )
    return jnp.asarray(quads, dtype), jnp.asarray(queries, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_quad_plain_paths_bit_identical(dtype):
    p, r = _quad_cases(dtype)
    # tensor adapter (ops/interp.py)
    w_tensor = np.asarray(interp_mod.quad_weights(p, r))
    # component adapter (ops/locate.py)
    px = [p[:, k, 0] for k in range(4)]
    py = [p[:, k, 1] for k in range(4)]
    pz = [p[:, k, 2] for k in range(4)]
    w_comp = np.stack(
        [np.asarray(w) for w in _quad_weights_c(
            px, py, pz, r[:, 0], r[:, 1], r[:, 2]
        )],
        axis=1,
    )
    # direct generic call with (1, B)-row-shaped components (the
    # Pallas adapters' layout)
    v_rows = [[p[:, k, d][None, :] for d in range(3)] for k in range(4)]
    q_rows = [r[:, d][None, :] for d in range(3)]
    w_rows = np.concatenate(
        [
            np.asarray(w)
            for w in wkern.quad_weights_generic(
                v_rows, q_rows, wkern.Plain(dtype)
            )
        ],
        axis=0,
    ).T

    np.testing.assert_array_equal(w_tensor, w_comp)
    np.testing.assert_array_equal(w_tensor, w_rows)
    assert np.isfinite(w_tensor).all(), "degenerate quads must stay finite"


def test_quad_df32_matches_f64():
    p, r = _quad_cases(jnp.float64)
    w64 = np.asarray(interp_mod.quad_weights(p, r))

    p32 = jnp.asarray(p, jnp.float32)
    r32 = jnp.asarray(r, jnp.float32)
    p_lo = jnp.asarray(p - p32.astype(jnp.float64), jnp.float32)
    r_lo = jnp.asarray(r - r32.astype(jnp.float64), jnp.float32)
    v = [
        [(p32[:, k, d], p_lo[:, k, d]) for d in range(3)]
        for k in range(4)
    ]
    q = [(r32[:, d], r_lo[:, d]) for d in range(3)]
    w_df = wkern.quad_weights_generic(v, q, wkern.DF())
    got = np.stack(
        [np.asarray(h, np.float64) + np.asarray(l, np.float64)
         for h, l in w_df],
        axis=1,
    )
    assert np.isfinite(got).all()
    # same branch structure by construction; df32 carries ~48 bits
    # (the sliver's weights are O(1e5) — ill-conditioned by design —
    # so the gate is relative)
    np.testing.assert_allclose(got, w64, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_simplex_plain_paths_bit_identical(dtype):
    rng = np.random.default_rng(7)
    # random non-degenerate tets + queries inside
    v0 = rng.random((16, 4, 3))
    bary = rng.dirichlet(np.ones(4), 16)
    q0 = np.einsum("bk,bkd->bd", bary, v0)
    p = jnp.asarray(v0, dtype)
    r = jnp.asarray(q0, dtype)
    vol = jnp.asarray(
        np.einsum(
            "bi,bi->b",
            np.cross(v0[:, 1] - v0[:, 0], v0[:, 2] - v0[:, 0]),
            v0[:, 3] - v0[:, 0],
        )
        / 6.0,
        dtype,
    )
    w_tensor = np.asarray(interp_mod.tetra_weights(p, vol, r))
    v_rows = [[p[:, k, d][None, :] for d in range(3)] for k in range(4)]
    q_rows = [r[:, d][None, :] for d in range(3)]
    trip = wkern.tetra_triples(v_rows, q_rows, wkern.Plain(dtype))
    w_rows = (
        np.concatenate([np.asarray(t) for t in trip], axis=0)
        / np.asarray(6.0 * vol)[None, :]
    ).T
    np.testing.assert_array_equal(w_tensor, w_rows)
    # weights of interior points sum to 1 and reproduce the point
    np.testing.assert_allclose(w_tensor.sum(1), 1.0, atol=1e-5
                               if dtype == jnp.float32 else 1e-12)
