"""Shared deterministic inputs for the Fortran parity harness.

Both sides (the golden-emitting run.sh on a gfortran machine and
tests/test_fortran_parity.py here) must evaluate the SAME query
points; this module is the single definition of them.
"""

import os

import numpy as np

MESHES = ("triangle", "quad", "tetra")
N_QUERIES = 1000
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(HERE, "goldens")


def query_points(mesh_name: str, rmin, rmax, n: int = N_QUERIES):
    """Deterministic uniform samples in the mesh bounding box — the
    test_triangle.f90:30-35 protocol with a fixed, named stream
    (PCG64 streams are stable across numpy versions by contract)."""
    seed = int.from_bytes(mesh_name.encode(), "little") % (2**63)
    rng = np.random.default_rng(seed)
    u = rng.random((n, 3), dtype=np.float64)
    return np.asarray(rmin) + u * (np.asarray(rmax) - np.asarray(rmin))


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, name)
