"""Multi-chip scaling: query batches sharded over a device mesh.

The reference is strictly serial (SURVEY.md §2.3: no MPI/NCCL/OpenMP);
its TPU-native replacement (SURVEY.md §5.8) is:

* mesh arrays **replicated** per device (small relative to HBM),
* query batches **sharded** over chips on a 1-D ``data`` mesh axis,
* ``shard_map`` so each device's neighbor-walk ``while_loop`` exits as
  soon as *its* shard converges (no per-step global all-reduce),
* communication is just the scatter/gather of query inputs and results
  over ICI — the hot loop needs no collectives because the grid is
  replicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import interp, locate
from .. import trace as trace_mod

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def replicate_grid(grid, mesh: Mesh):
    """Place every grid leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(grid, jax.tree.map(lambda _: sharding, grid))


def shard_batch(x, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Shard the leading (batch) axis over the mesh, padding to a
    multiple of the device count.  Returns (sharded_x, original_b)."""
    n = mesh.shape[axis_name]
    b = x.shape[0]
    pad = (-b) % n
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec)), b


def _grid_spec(grid):
    return jax.tree.map(lambda _: P(), grid)


def sharded_interpolate_at(mesh: Mesh, axis_name: str = DATA_AXIS):
    """Build a jitted, shard_mapped version of ``interpolate_at``.

    Returns ``f(grid, r, i_vars, guess) -> (values, i_cell, found)``
    with ``r``/``guess`` sharded on the batch axis and the grid
    replicated.  Each device walks only its own queries.
    """

    def local(grid, r, i_vars, guess):
        return interp.interpolate_at(grid, r, i_vars, guess)

    def run(grid, r, i_vars, guess):
        spec_b = P(axis_name)
        f = jax.shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(_grid_spec(grid), P(axis_name, None), P(), spec_b),
            out_specs=(P(axis_name, None), spec_b, spec_b),
        )
        return f(grid, r, i_vars, guess)

    return jax.jit(run)


def sharded_get_cell(mesh: Mesh, axis_name: str = DATA_AXIS):
    """Sharded point location: ``f(grid, r, guess) -> (i_cell, found)``."""

    def local(grid, r, guess):
        return locate.get_cell(grid, r, guess)

    def run(grid, r, guess):
        f = jax.shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(_grid_spec(grid), P(axis_name, None), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name)),
        )
        return f(grid, r, guess)

    return jax.jit(run)


def sharded_trace(mesh: Mesh, axis_name: str = DATA_AXIS, **trace_kwargs):
    """Sharded field-line tracing over a batch of seed points.

    Returns ``f(grid, y0, i_field) -> TraceResult`` with trajectories
    sharded over devices; each device's RK23 while_loop runs until its
    own trajectories terminate.
    """

    def local(grid, y0, i_field):
        return trace_mod.integrate_along_field(
            grid, y0, i_field, **trace_kwargs
        )

    def run(grid, y0, i_field):
        f = jax.shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(_grid_spec(grid), P(axis_name, None), P()),
            out_specs=trace_mod.TraceResult(
                y=P(axis_name, None, None),
                y_field=P(axis_name, None, None),
                n_steps=P(axis_name),
                boundary_material=P(axis_name),
                n_iterations=P(axis_name),
            ),
        )
        return f(grid, y0, i_field)

    return jax.jit(run)
