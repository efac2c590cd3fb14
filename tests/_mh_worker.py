"""Worker process for test_multiprocess.py: one of N jax.distributed
processes driving the multi-host input pipeline end-to-end
(distribute_queries -> sharded_interpolate_at -> collect_results) with
UNEQUAL per-process query contributions.

Invoked as:
    python tests/_mh_worker.py <coordinator> <num_procs> <proc_id> <outfile>
"""

import os
import sys

coordinator, num_procs, proc_id, outfile = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

# Force CPU with 2 local virtual devices BEFORE jax initializes
# (the container presets JAX_PLATFORMS=axon; both the env var and the
# config update are required to win over the preset)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

jax.distributed.initialize(
    coordinator_address=coordinator,
    num_processes=num_procs,
    process_id=proc_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import interpolate_unstructured_tpu as iu  # noqa: E402
from interpolate_unstructured_tpu.parallel import sharding as sh  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == num_procs
assert len(jax.devices()) == 2 * num_procs, jax.devices()

# Identical grid built in every process (deterministic construction)
from interpolate_unstructured_tpu.utils import meshgen  # noqa: E402

points, cells, neighbors = meshgen.tet_box_mesh(4, 4, 4)
grid = iu.build_grid(
    points, cells, neighbors, "tetra",
    point_data={"Polynomial": points.sum(axis=1) + 1.0},
    locate_mode="walk",
)

mesh = sh.make_mesh()
grid = sh.replicate_grid(grid, mesh)

# Unequal contributions that also force per-process padding:
# process p contributes 5 + 4*p queries (5, 9, ...), padded to the
# 2-device multiple (6, 10, ...) inside distribute_queries.
rng = np.random.default_rng(100 + proc_id)
b_local = 5 + 4 * proc_id
r_local = rng.random((b_local, 3))

r_global, local_b = sh.distribute_queries(r_local, mesh)
assert local_b == b_local

# Guesses: cold (-1) everywhere, sharded like the queries
f = sh.sharded_interpolate_at(mesh)
vals, ic, found = f(grid, r_global, jnp.asarray([0]))

vals_np = sh.collect_results(vals, local_b)
found_np = sh.collect_results(found, local_b)

np.savez(
    outfile,
    vals=vals_np,
    found=found_np,
    r_local=r_local,
    proc_id=np.asarray([proc_id]),
)
print(f"worker {proc_id}: collected {vals_np.shape} ok", flush=True)
