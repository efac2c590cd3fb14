"""Double-float (compensated f32) arithmetic for the accurate
interpolation mode.

TPU float64 is software-emulated and ~100x slower than f32 end to end
(benchmarks/RESULTS.md), so the fast path runs float32 and tops out
near 1e-6 absolute error.  This module provides the classic
error-free-transform arithmetic (Dekker 1971, Knuth TAOCP 4.2.2) on
*pairs* of f32 arrays — a value is represented as ``hi + lo`` with
``|lo| <= ulp(hi)/2`` — giving ~48 effective mantissa bits (~1e-14
relative) at a handful of native f32 VPU ops per operation.  It is the
numeric core of :mod:`.interp_acc`, which bridges the gap between the
f32 fast path and the f64 reference contract (SURVEY.md §7 "hard
parts": a compensated-f32 middle path).

Only the operations the barycentric / inverse-bilinear weight kernels
need are implemented.  All functions are shape-polymorphic and
jit-safe; inputs are (hi, lo) tuples of equal-shape f32 arrays (lo may
be a scalar 0.0 for exact inputs).

No ``jax.lax`` fused multiply-add is exposed to Python, so products
use Dekker's split (f32 mantissa 24 bits -> split constant 2^12 + 1).
XLA preserves IEEE float semantics (no reassociation), which these
transforms rely on.
"""

from __future__ import annotations

import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1 for float32 (Dekker split)


def two_sum(a, b):
    """Error-free a + b: returns (s, e) with s = fl(a+b), s + e = a + b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b: returns (p, e) with p = fl(a*b), p + e = a*b."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x, y):
    """df + df -> df (accurate/Knuth variant — the sloppy Dekker add
    loses digits under cancellation of close magnitudes)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    t, f = two_sum(xl, yl)
    s, e = quick_two_sum(s, e + t)
    return quick_two_sum(s, e + f)


def sub(x, y):
    yh, yl = y
    return add(x, (-yh, -yl))


def mul(x, y):
    """df * df -> df."""
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def div(x, y):
    """df / df -> df (one Newton refinement of the f32 quotient)."""
    xh, xl = x
    yh, yl = y
    q1 = xh / yh
    # r = x - q1*y, computed in df
    r = sub(x, mul((q1, jnp.zeros_like(q1)), y))
    q2 = (r[0] + r[1]) / (yh + yl)
    return quick_two_sum(q1, q2)


def sqrt(x):
    """df sqrt (one Newton step from the f32 root)."""
    xh, xl = x
    s1 = jnp.sqrt(xh)
    safe = jnp.where(s1 > 0, s1, 1.0)
    r = sub(x, mul((s1, jnp.zeros_like(s1)), (s1, jnp.zeros_like(s1))))
    s2 = jnp.where(s1 > 0, (r[0] + r[1]) / (2.0 * safe), 0.0)
    return quick_two_sum(s1, s2)


def from_f32(a):
    return a, jnp.zeros_like(a)


def to_f32(x):
    return x[0] + x[1]


def neg(x):
    return -x[0], -x[1]


def scale(x, c):
    """df * exact f32 scalar/array c."""
    return mul(x, (c, jnp.zeros_like(c)))


def dot3(ax, ay, az, bx, by, bz):
    """df dot product of two 3-vectors of df components."""
    return add(add(mul(ax, bx), mul(ay, by)), mul(az, bz))


def cross(ax, ay, az, bx, by, bz):
    """df cross product -> 3 df components."""
    cx = sub(mul(ay, bz), mul(az, by))
    cy = sub(mul(az, bx), mul(ax, bz))
    cz = sub(mul(ax, by), mul(ay, bx))
    return cx, cy, cz


def triple(ax, ay, az, bx, by, bz, cx, cy, cz):
    """df scalar triple product a . (b x c)."""
    vx, vy, vz = cross(bx, by, bz, cx, cy, cz)
    return dot3(ax, ay, az, vx, vy, vz)
