"""Pallas TPU kernel: one neighbor-walk round on gathered rows.

The batched walk's per-round face math in XLA pays the small-trailing-
dim tax twice over: (B, nf, 3) normals pad their minor dim to 128
lanes and (B, nf) distances pad nf to 128 — measured ~15 ms/round at
625k lanes on v5e, versus ~0.3 ms for the row gather that feeds it.
This kernel runs the whole round body on-chip in the transposed
layout (queries on lanes): ray-face distances, two-best exit-face
tracking (the backtrack guard needs the runner-up), arrival/boundary
status, and the state update, with only the per-round row gather left
to XLA.

Semantics match ops.locate.walk's XLA body exactly for the
``i_icell_mask is None`` case (iu_get_cell_through_neighbors +
get_cell_intersection, m_interp_unstructured.f90:664-764); mask-stop
walks keep the XLA path.

Walk-table row layout (models/grid._build_walk_table — also the
leading columns of the tracer's fused tables): face normals (nf*3,
vector-major: column f*3+d) | face offsets (nf) | neighbor ids (nf) |
cell vertex coords | volume | padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mirrors ops.locate's status codes (importing locate here would cycle)
STATUS_ARRIVED = 0
STATUS_BOUNDARY = -1


def _round_up(x, m):
    return -(-x // m) * m


def _face_round(GT, nf, u, p, prev, big):
    """Exit-face selection on transposed rows: the shared core of every
    walk-round kernel (this module's and ops/pallas_trace.py's).

    Two-best tracking: distance along ``u`` to each face plane (only
    faces with path . n > 0), keeping best and runner-up neighbor so a
    rounding-induced immediate backtrack can take the second exit
    (locate.walk:255-266).

    Returns (face_dist >= 0, ic_next, hit)."""
    ux, uy, uz = u
    px, py, pz = p
    d1 = jnp.full_like(px, big)
    d2 = jnp.full_like(px, big)
    n1 = jnp.full_like(prev, -1)
    n2 = jnp.full_like(prev, -1)
    for f in range(nf):
        nx = GT[f * 3 + 0 : f * 3 + 1]
        ny = GT[f * 3 + 1 : f * 3 + 2]
        nz = GT[f * 3 + 2 : f * 3 + 3]
        off = GT[nf * 3 + f : nf * 3 + f + 1]
        nbr = GT[nf * 4 + f : nf * 4 + f + 1].astype(jnp.int32)
        pdn = nx * ux + ny * uy + nz * uz
        rpn = nx * px + ny * py + nz * pz
        dist = jnp.where(pdn > 0, (off - rpn) / pdn, big)
        better1 = dist < d1
        better2 = ~better1 & (dist < d2)
        d2 = jnp.where(better1, d1, jnp.where(better2, dist, d2))
        n2 = jnp.where(better1, n1, jnp.where(better2, nbr, n2))
        d1 = jnp.where(better1, dist, d1)
        n1 = jnp.where(better1, nbr, n1)

    backtrack = (n1 == prev) & (prev >= 0)
    face_dist = jnp.where(backtrack, d2, d1)
    ic_next = jnp.where(backtrack, n2, n1)

    hit = face_dist < 0.5 * big
    face_dist = jnp.maximum(face_dist, 0.0)  # never step backwards
    return face_dist, ic_next, hit


def _kernel(
    eps_ref, g_ref, u_ref, rp_ref, dl_ref, ic_ref, prev_ref, st_ref,
    act_ref, steps_ref,
    rp_o, dl_o, ic_o, prev_o, st_o, act_o, steps_o,
    *, nf, big
):
    GT = jnp.transpose(g_ref[:])  # (W, T)
    # dtype-scaled tolerances arrive as data (traced values under jit)
    nudge = eps_ref[0:1, 0:1]
    eps_arrive = eps_ref[1:2, 0:1]

    ux, uy, uz = u_ref[0:1, :], u_ref[1:2, :], u_ref[2:3, :]
    px, py, pz = rp_ref[0:1, :], rp_ref[1:2, :], rp_ref[2:3, :]
    prev = prev_ref[:]  # (1, T) int32
    active = act_ref[:] != 0

    face_dist, ic_next, hit = _face_round(
        GT, nf, (ux, uy, uz), (px, py, pz), prev, big
    )

    dist_left = dl_ref[:]
    new_dist_left = dist_left - face_dist
    crossing = hit & (new_dist_left > eps_arrive)
    out_of_domain = ic_next < 0

    continuing = crossing & ~out_of_domain
    advance = face_dist + jnp.where(continuing, nudge, 0.0)
    adv = jnp.where(active & hit, advance, 0.0)
    rp_o[0:1, :] = px + adv * ux
    rp_o[1:2, :] = py + adv * uy
    rp_o[2:3, :] = pz + adv * uz
    dl_o[:] = jnp.where(active & hit, dist_left - advance, dist_left)

    new_status = jnp.where(
        crossing & out_of_domain, STATUS_BOUNDARY, STATUS_ARRIVED
    )
    st_o[:] = jnp.where(active, new_status, st_ref[:])
    ic = ic_ref[:]
    prev_o[:] = jnp.where(active & continuing, ic, prev)
    ic_o[:] = jnp.where(active & crossing, ic_next, ic)
    steps_o[:] = steps_ref[:] + active.astype(jnp.int32)
    act_o[:] = (active & continuing).astype(jnp.int32)


def supported(grid, dtype, i_icell_mask) -> bool:
    return (
        jnp.dtype(dtype) == jnp.float32
        and i_icell_mask is None
        and jax.default_backend() == "tpu"
    )


def walk_round(grid, table, u_t, state, *, nudge, eps_arrive,
               tile: int = 1024, interpret: bool | None = None):
    """One walk round over transposed state.

    Args:
      table: (n_cells, W) packed rows (walk table or a fused variant
        sharing the leading normals|offsets|neighbors columns)
      u_t: (3, B) walk directions (constant across rounds)
      state: (rp_t (3,B), dist_left (1,B), ic (1,B) i32, prev (1,B)
        i32, status (1,B) i32, active (1,B) i32, steps (1,B) i32) with
        B a multiple of ``tile``

    Returns the updated state tuple.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from ..utils.config import huge_distance

    rp_t, dist_left, ic, prev, status, active, steps = state
    b = rp_t.shape[1]
    nf = grid.n_faces_per_cell
    w = table.shape[1]
    f32 = jnp.float32

    g = table[jnp.maximum(ic[0], 0)]  # (B, W) — XLA row gather

    kernel = functools.partial(
        _kernel,
        nf=nf,
        big=float(huge_distance(f32)),
    )
    eps_arr = jnp.stack(
        [jnp.asarray(nudge, f32), jnp.asarray(eps_arrive, f32)]
    ).reshape(2, 1)

    def row_spec(r, dt):
        return pl.BlockSpec((r, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    n_tiles = b // tile
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec(3, f32),  # u
            row_spec(3, f32),  # r_p
            row_spec(1, f32),  # dist_left
            row_spec(1, jnp.int32),  # ic
            row_spec(1, jnp.int32),  # prev
            row_spec(1, jnp.int32),  # status
            row_spec(1, jnp.int32),  # active
            row_spec(1, jnp.int32),  # steps
        ],
        out_specs=[
            row_spec(3, f32),
            row_spec(1, f32),
            row_spec(1, jnp.int32),
            row_spec(1, jnp.int32),
            row_spec(1, jnp.int32),
            row_spec(1, jnp.int32),
            row_spec(1, jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, b), f32),
            jax.ShapeDtypeStruct((1, b), f32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
        ],
        interpret=interpret,
    )(eps_arr, g, u_t, rp_t, dist_left, ic, prev, status, active, steps)
    return tuple(out)
