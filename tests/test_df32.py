"""Unit tests for the double-float (compensated f32) arithmetic core.

Each error-free transform is checked EXACTLY against float64 (the f32
pair must reproduce the f64 result to the df32 representation bound),
on random values spanning many magnitudes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from interpolate_unstructured_tpu.ops import df32


def _rand(n, lo=-1.0, hi=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return (lo + (hi - lo) * rng.random(n)).astype(np.float32)


def _df_err(x_df, ref64):
    got = np.asarray(x_df[0], np.float64) + np.asarray(x_df[1], np.float64)
    scale = np.maximum(np.abs(ref64), 1e-30)
    return np.max(np.abs(got - ref64) / scale)


def test_two_sum_exact():
    a = _rand(1000, -1e6, 1e6, seed=1)
    b = _rand(1000, -1e-3, 1e-3, seed=2)
    s, e = df32.two_sum(jnp.asarray(a), jnp.asarray(b))
    # s + e must equal a + b EXACTLY in f64 (both f32, sum fits f64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) + b.astype(np.float64),
    )


def test_two_prod_exact():
    a = _rand(1000, -300.0, 300.0, seed=3)
    b = _rand(1000, -0.02, 0.02, seed=4)
    p, e = df32.two_prod(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) * b.astype(np.float64),
    )


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
def test_df_ops_near_f64(op):
    xh = _rand(4096, -5.0, 5.0, seed=5)
    xl = (_rand(4096, -1, 1, seed=6) * 1e-8).astype(np.float32)
    yh = _rand(4096, 0.1, 3.0, seed=7)  # bounded away from 0 for div
    yl = (_rand(4096, -1, 1, seed=8) * 1e-9).astype(np.float32)
    x64 = xh.astype(np.float64) + xl.astype(np.float64)
    y64 = yh.astype(np.float64) + yl.astype(np.float64)
    # normalize the pairs (|lo| <= ulp(hi)/2), as every EFT output is
    x = df32.two_sum(jnp.asarray(xh), jnp.asarray(xl))
    y = df32.two_sum(jnp.asarray(yh), jnp.asarray(yl))
    got = getattr(df32, op)(x, y)
    ref = {
        "add": x64 + y64, "sub": x64 - y64,
        "mul": x64 * y64, "div": x64 / y64,
    }[op]
    assert _df_err(got, ref) < 1e-13


def test_df_sqrt():
    xh = _rand(4096, 0.01, 9.0, seed=9)
    x = (jnp.asarray(xh), jnp.zeros_like(jnp.asarray(xh)))
    got = df32.sqrt(x)
    assert _df_err(got, np.sqrt(xh.astype(np.float64))) < 1e-13


def test_df_triple_product_cancellation():
    # Near-degenerate tets: the triple product cancels heavily; plain
    # f32 loses most digits, df32 must stay at ~1e-13 relative.
    rng = np.random.default_rng(10)
    base = rng.random((4096, 3, 3)).astype(np.float32)
    base[:, 2] = 0.5 * (base[:, 0] + base[:, 1]) + 1e-3 * base[:, 2]
    a, b, c = (base[:, i] for i in range(3))
    comp = lambda v, d: (jnp.asarray(v[:, d]), jnp.zeros(v.shape[0], jnp.float32))
    got = df32.triple(
        comp(a, 0), comp(a, 1), comp(a, 2),
        comp(b, 0), comp(b, 1), comp(b, 2),
        comp(c, 0), comp(c, 1), comp(c, 2),
    )
    a64, b64, c64 = (v.astype(np.float64) for v in (a, b, c))
    ref = np.einsum("ij,ij->i", a64, np.cross(b64, c64))
    got64 = np.asarray(got[0], np.float64) + np.asarray(got[1], np.float64)
    # relative to the PRODUCT scale, not the cancelled result
    scale = np.abs(a64).max(1) * np.abs(b64).max(1) * np.abs(c64).max(1)
    assert np.max(np.abs(got64 - ref) / scale) < 1e-12
