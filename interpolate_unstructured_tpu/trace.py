"""Field-line tracing: adaptive Bogacki–Shampine RK23 along an
interpolated vector field.

Re-design of ``iu_integrate_along_field``
(m_interp_unstructured.f90:987-1217) for TPU execution: one batched
``lax.while_loop`` over the whole trajectory batch with fixed-shape
output buffers and explicit active-lane masking (vmapping a nested
while_loop both miscompiles at some batch shapes on this backend and
is ~5x slower — see benchmarks/RESULTS.md).  Control-flow parity:

* integrates along the *unit vector* of the interpolated field
  (arc-length parameterization, get_unitvec :1193-1201, optional
  ``reverse``), plus ``nvar`` user ODE variables via a traced callback
  (integrate_sub_t, :61-74);
* embedded 2nd-order error estimate with
  ``scales = atol + max(|y3|,|y2|)*rtol`` and
  ``err = sqrt(sum(((y3-y2)/scales)^2)/3)`` (:1162-1163); accept when
  ``err <= 1`` or ``dx < 2*min_dx`` (:1165);
* step-size update ``dx*min(max_growth, 0.8*err**(-1/3))`` clamped to
  ``[min_dx, max_dx]``, growth capped at 1x right after a rejection
  else 2x (:1178-1188);
* boundary handling: when a sub-step's neighbor walk stops early
  (status != 0), shrink ``dx = (1-1e-8)*|r_p - r0|`` (distance to the
  intersection, :1084) and retry; terminate when ``dx < min_dx``,
  reporting ``boundary_material`` (-1 physical boundary, else the mask
  value of the cell entered, :1086-1096);
* optional ``axisymmetric`` clamps the first coordinate >= 1e-12
  (:1120/:1133/:1147/:1171); optional icell mask restricts integration
  to a region (:1055-1068).

The Fortran ``cycle``-on-failure structure is flattened branch-free:
when an earlier sub-step fails (or a lane is done), later walks are
aimed at their own start point, which makes them degenerate no-ops
(the walk's tiny-distance short-circuit, :689-692), so one pass through
the body computes exactly what the reference's goto-laden loop does.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops import interp, locate

SAFETY_FAC = 0.8
MIN_RADIUS = 1e-12


def _shrink_eps(dtype):
    """Boundary shrink factor: dx -> (1-eps)*|r_p - r0| (:1084).

    The reference's 1e-8 assumes float64; in float32, (1 - 1e-8) == 1
    exactly, so dx never decreases and the shrink-and-retry loop
    livelocks at domain boundaries.  Use ~sqrt(machine eps) instead.
    """
    import numpy as np

    if np.dtype(dtype) == np.float32:
        return 3e-4
    return 1e-8
# boundary_material sentinel: trace still running / buffer exhausted
BM_NOT_REACHED = -2


class TraceResult(NamedTuple):
    """Batched trace output (shapes lead with the trajectory batch B)."""

    y: Any  # (B, max_steps, ndim+nvar) solution curve; [i, 0] = y0
    y_field: Any  # (B, max_steps, ndim) field samples along the curve
    n_steps: Any  # (B,) int32: valid points; max_steps+1 = not reached
    boundary_material: Any  # (B,) int32: -1 physical boundary, mask value,
    #                         or BM_NOT_REACHED if the buffer filled first
    n_iterations: Any  # (B,) int32: RK iterations spent (diagnostics)


class _State(NamedTuple):
    y_buf: Any
    yf_buf: Any
    n_idx: Any  # index of last accepted point (n_steps-1)
    i_cell_prev: Any
    dx: Any
    last_rejected: Any
    iteration: Any
    done: Any
    overflow: Any  # buffer filled before a boundary was reached
    boundary_material: Any


def _default_sub_int(field, y):
    return jnp.zeros((0,), dtype=y.dtype)


def integrate_along_field(
    grid,
    y0,
    i_field,
    *,
    nvar: int = 0,
    sub_int=None,
    min_dx: float,
    max_dx: float,
    max_steps: int,
    rtol: float,
    atol: float,
    reverse: bool = False,
    axisymmetric: bool = False,
    i_icell_mask: int | None = None,
    mask_value: int | None = None,
    max_iterations: int | None = None,
) -> TraceResult:
    """Trace field lines from a batch of seed states.

    Args:
      grid: UGrid with the field stored as point data.
      y0: (B, ndim+nvar) initial positions + extra variable values.
      i_field: sequence of ndim point-data indices of the field
        components to trace.
      nvar: number of extra ODE variables (trailing entries of y0).
      sub_int: callback ``(field (ndim,), y (ndim+nvar,)) -> (nvar,)``
        giving the arc-length derivatives of the extra variables
        (integrate_sub_t, :61-74).  Traced into the loop.
      min_dx/max_dx/max_steps/rtol/atol/reverse/axisymmetric: see module
        docstring.
      i_icell_mask/mask_value: integrate only where
        ``icell_data[:, i_icell_mask] == mask_value`` (:1055-1068).
      max_iterations: hard cap on RK iterations (the reference loops
        unbounded, :1078); defaults to ``50 * max_steps + 1000``.

    Returns:
      TraceResult with per-trajectory curves, field samples, step
      counts, and boundary codes.
    """
    if max_dx < min_dx:
        raise ValueError("max_dx < min_dx")
    if max_steps < 1:
        raise ValueError("max_steps < 1")
    if (i_icell_mask is None) != (mask_value is None):
        raise ValueError("i_icell_mask and mask_value must be given together")
    ndim = len(tuple(i_field))
    if ndim != grid.ndim:
        raise ValueError(f"i_field has {ndim} entries, grid is {grid.ndim}D")
    if sub_int is None:
        sub_int = _default_sub_int
    if max_iterations is None:
        max_iterations = 50 * max_steps + 1000

    i_field = jnp.asarray(i_field)
    y0 = jnp.asarray(y0)
    if y0.ndim != 2 or y0.shape[1] != ndim + nvar:
        raise ValueError(f"y0 must have shape (B, {ndim + nvar})")
    dtype = grid.dtype
    y0 = y0.astype(dtype)
    shrink_eps = _shrink_eps(dtype)

    b = y0.shape[0]
    rows = jnp.arange(b)

    def pad3(r_nd):
        """(B, ndim) -> (B, 3) with zero-filled unused coords (:1042)."""
        return jnp.zeros((b, 3), dtype=dtype).at[:, :ndim].set(r_nd)

    def clamp_axi(r3):
        if axisymmetric:
            return r3.at[:, 0].set(jnp.maximum(r3[:, 0], MIN_RADIUS))
        return r3

    def unitvec(field):
        u = field / jnp.sqrt(jnp.sum(field * field, axis=1, keepdims=True))
        return -u if reverse else u

    sub_int_b = jax.vmap(sub_int)  # user callback stays per-point

    def boundary_code(ic):
        """-1 for a physical boundary, else the mask value of the cell
        that ended the trace (:1086-1096)."""
        if i_icell_mask is None:
            return jnp.full_like(ic, -1)
        masked = grid.icell_data[jnp.maximum(ic, 0), i_icell_mask]
        return jnp.where(ic < 0, -1, masked.astype(jnp.int32))

    def rk_stage(anchor, k_prev, coeff, ic_start, r0, ok):
        """One batched walk+interpolate sub-step; lanes with ``ok``
        False aim at their own start, making the walk a degenerate
        no-op (tiny-distance short circuit, :689-692)."""
        ys = anchor + coeff[:, None] * k_prev
        r3 = clamp_axi(pad3(ys[:, :ndim]))
        tgt = jnp.where(ok[:, None], r3, r0)
        ic, r_p, _, st = locate.walk(
            grid,
            r0,
            tgt,
            ic_start,
            max_steps=grid.config.trace_walk_max_steps,
            i_icell_mask=i_icell_mask,
        )
        failed = ok & (st != 0)
        field = interp.interpolate_at_icell(
            grid, tgt, i_field, jnp.maximum(ic, 0)
        )
        k = jnp.concatenate([unitvec(field), sub_int_b(field, ys)], axis=1)
        return ys, field, k, ic, r_p, failed

    # ---- initialization (:1045-1073) -------------------------------------
    r0_3 = pad3(y0[:, :ndim])
    ic0, found0 = locate.get_cell(grid, r0_3)
    ic0 = jnp.where(found0, ic0, -1).astype(jnp.int32)
    field0 = interp.interpolate_at_icell(
        grid, r0_3, i_field, jnp.maximum(ic0, 0)
    )
    if mask_value is not None:
        in_region = found0 & (
            grid.icell_data[jnp.maximum(ic0, 0), i_icell_mask] == mask_value
        )
    else:
        in_region = found0
    start_done = ~in_region
    start_bm = jnp.where(
        start_done, boundary_code(ic0), jnp.int32(BM_NOT_REACHED)
    )

    # One scratch row past max_steps swallows masked writes
    y_buf = jnp.zeros((b, max_steps + 1, ndim + nvar), dtype=dtype)
    y_buf = y_buf.at[:, 0, :].set(y0)
    yf_buf = jnp.zeros((b, max_steps + 1, ndim), dtype=dtype)
    yf_buf = yf_buf.at[:, 0, :].set(
        jnp.where(in_region[:, None], field0, 0.0)
    )

    init = _State(
        y_buf=y_buf,
        yf_buf=yf_buf,
        n_idx=jnp.zeros(b, jnp.int32),
        i_cell_prev=ic0,
        dx=jnp.full(b, max_dx, dtype),
        last_rejected=jnp.full(b, -100, jnp.int32),
        iteration=jnp.zeros(b, jnp.int32),
        done=start_done,
        overflow=jnp.zeros(b, bool),
        boundary_material=start_bm,
    )

    def take_row(buf, idx):
        """(B, S, D) rows at per-lane idx without a slow gather path."""
        return jnp.take_along_axis(buf, idx[:, None, None], axis=1)[:, 0]

    def cond(carry):
        it, s = carry
        return jnp.any(~s.done) & (it < max_iterations)

    def body(carry):
        it, s = carry
        act = ~s.done
        anchor = take_row(s.y_buf, s.n_idx)  # (B, ndim+nvar)
        field_a = take_row(s.yf_buf, s.n_idx)
        r0 = pad3(anchor[:, :ndim])
        dx = s.dx

        # k1 reuses the stored field sample (:1109-1115)
        k1 = jnp.concatenate(
            [unitvec(field_a), sub_int_b(field_a, anchor)], axis=1
        )

        ok = act
        _, _, k2, ic2, rp2, f2 = rk_stage(
            anchor, k1, 0.5 * dx, s.i_cell_prev, r0, ok
        )
        ok = ok & ~f2
        _, _, k3, ic3, rp3, f3 = rk_stage(
            anchor, k2, 0.75 * dx, s.i_cell_prev, r0, ok
        )
        ok = ok & ~f3
        # 3rd-order update + 4th sub-step at the updated point (:1144-1156)
        k123 = (2.0 * k1 + 3.0 * k2 + 4.0 * k3) / 9.0
        ys3, field4, k4, ic4, rp4, f4 = rk_stage(
            anchor, k123, dx, s.i_cell_prev, r0, ok
        )
        ok = ok & ~f4

        failed = act & ~ok
        # First failing stage supplies (r_p, i_cell) for the shrink
        r_p = jnp.where(
            f2[:, None], rp2, jnp.where(f3[:, None], rp3, rp4)
        )
        ic_fail = jnp.where(f2, ic2, jnp.where(f3, ic3, ic4))

        # Embedded 2nd-order estimate and error norm (:1159-1163)
        y2nd = anchor + dx[:, None] * (
            7.0 * k1 + 6.0 * k2 + 8.0 * k3 + 3.0 * k4
        ) / 24.0
        scales = atol + jnp.maximum(jnp.abs(ys3), jnp.abs(y2nd)) * rtol
        err = jnp.sqrt(jnp.sum(((ys3 - y2nd) / scales) ** 2, axis=1) / 3.0)

        accept = ok & ((err <= 1.0) | (dx < 2.0 * min_dx))

        # ---- failure path: shrink dx to the boundary distance ----
        # Capped at 0.75*dx: when a trajectory hugs a wall the walk
        # fails right at the step end (d_boundary ~ dx) and the (1-eps)
        # factor alone decays dx at ~eps per retry — thousands of
        # futile iterations (the reference's 1e-8 factor would
        # effectively hang there).
        d_boundary = jnp.sqrt(jnp.sum((r_p - r0) ** 2, axis=1))
        dx_fail = jnp.minimum((1.0 - shrink_eps) * d_boundary, 0.75 * dx)
        hit_boundary = failed & (dx_fail < min_dx)

        # ---- accept path: write the new point ----
        n_new = jnp.where(accept, s.n_idx + 1, s.n_idx)
        overflow = accept & (n_new >= max_steps)
        write = accept & ~overflow
        # Non-writers scatter into the scratch row (index max_steps)
        w_idx = jnp.where(write, n_new, max_steps)
        ys_store = clamp_axi_y(ys3)
        y_buf = s.y_buf.at[rows, w_idx].set(ys_store)
        yf_buf = s.yf_buf.at[rows, w_idx].set(field4)
        i_cell_prev = jnp.where(accept, ic4, s.i_cell_prev)

        # ---- step-size control (:1178-1188) ----
        last_rejected = jnp.where(
            act & (failed | ~accept), it, s.last_rejected
        )
        max_growth = jnp.where(last_rejected > it - 2, 1.0, 2.0).astype(
            dtype
        )
        dx_factor = jnp.minimum(
            max_growth, SAFETY_FAC * (1.0 / err) ** (1.0 / 3.0)
        )
        dx_ok = jnp.clip(dx * dx_factor, min_dx, max_dx)
        dx_new = jnp.where(failed, dx_fail, dx_ok)
        dx_new = jnp.where(act, dx_new, s.dx)

        done = s.done | hit_boundary | overflow
        bm = jnp.where(
            hit_boundary, boundary_code(ic_fail), s.boundary_material
        )

        return (
            it + 1,
            _State(
                y_buf=y_buf,
                yf_buf=yf_buf,
                n_idx=jnp.where(write, n_new, s.n_idx),
                i_cell_prev=i_cell_prev,
                dx=dx_new,
                last_rejected=last_rejected,
                iteration=jnp.where(act, it + 1, s.iteration),
                done=done,
                overflow=s.overflow | overflow,
                boundary_material=bm,
            ),
        )

    def clamp_axi_y(ys):
        if axisymmetric:
            return ys.at[:, 0].set(jnp.maximum(ys[:, 0], MIN_RADIUS))
        return ys

    _, final = lax.while_loop(cond, body, (jnp.int32(0), init))
    # n_steps: points stored; max_steps+1 flags 'boundary not reached
    # before the buffer filled' (:1167-1168)
    n_steps = jnp.where(
        final.overflow, jnp.int32(max_steps + 1), final.n_idx + 1
    )
    return TraceResult(
        y=final.y_buf[:, :max_steps],
        y_field=final.yf_buf[:, :max_steps],
        n_steps=n_steps,
        boundary_material=final.boundary_material.astype(jnp.int32),
        n_iterations=final.iteration,
    )
