"""Measured serial single-core denominator for the headline speedup.

BASELINE.json's metric is "speedup vs the Fortran benchmark.f90 run
locally", but the reference cannot be built in this container (no
gfortran; the kdtree2 submodule is empty — BASELINE.md).  As the
round-3 verdict directed, this is the stand-in: the reference
ALGORITHM (kd-style nearest-center seed -> neighbor walk -> inside
test -> barycentric interpolation; m_interp_unstructured.f90:412-551)
implemented one-query-at-a-time in numpy scalars on one CPU core and
timed on a sample of the same protocol.

Two numbers are reported:

* ``serial_qps`` — the per-query Python/numpy serial walk.  Protocol-
  faithful but carries Python interpreter overhead, so it UNDERSTATES
  a compiled serial implementation.
* ``vectorized_cpu_qps`` — single-core numpy brute-force containment
  (margins via one BLAS matmul) + barycentric values over the full 1M
  batch.  For an 8-cell mesh this is close to the best any single-core
  CPU code can do and so OVERSTATES the Fortran walk.  A gfortran -O2
  build of benchmark.f90 lands between the two brackets.
"""

from __future__ import annotations

import time

import numpy as np


def _build_serial_mesh(points, cells, neighbors):
    """Per-cell face planes + centers for the serial walk (tri mesh)."""
    p = points[cells]  # (C, 3, 3)
    centers = p.mean(axis=1)
    # face k of a triangle connects vertices (k, k+1) — the repo/
    # reference convention (m_interp_unstructured.f90:327-349) — and is
    # opposite vertex (k+2); outward in-plane normal
    n_cells = cells.shape[0]
    normals = np.zeros((n_cells, 3, 3))
    offsets = np.zeros((n_cells, 3))
    for k in range(3):
        a = p[:, k]
        b = p[:, (k + 1) % 3]
        e = b - a
        # in-plane outward normal: rotate edge by 90deg in the z=0 plane
        n = np.stack([e[:, 1], -e[:, 0], np.zeros(n_cells)], axis=1)
        # orient away from the opposite vertex
        s = ((p[:, (k + 2) % 3] - a) * n).sum(axis=1)
        n[s > 0] *= -1.0
        n /= np.linalg.norm(n, axis=1)[:, None]
        normals[:, k] = n
        offsets[:, k] = (n * a).sum(axis=1)
    areas = 0.5 * np.abs(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])[:, 2]
    )
    return centers, normals, offsets, areas


def serial_walk_qps(points, cells, neighbors, values, queries,
                    sample=20_000):
    """Per-query serial walk+interpolate; returns (qps, max_err_probe).

    The walk matches iu_get_cell (:412-434): nearest cell center as the
    cold seed, then hop through the face whose plane the query is most
    outside of, until the inside test passes.
    """
    centers, normals, offsets, areas = _build_serial_mesh(
        points, cells, neighbors
    )
    q = queries[:sample]
    p_cells = points[cells]
    v_cells = values[cells]
    eps = 1e-10

    t0 = time.perf_counter()
    out = np.empty(len(q))
    for i in range(len(q)):
        r = q[i]
        # cold seed: nearest cell center (kdtree2_n_nearest stand-in;
        # exact 1-NN by scan — the tree wins only at large C)
        ic = int(np.argmin(((centers - r) ** 2).sum(axis=1)))
        for _ in range(64):
            m = offsets[ic] - normals[ic] @ r
            k = int(np.argmin(m))
            if m[k] >= -eps:
                break
            nxt = neighbors[ic, k]
            if nxt < 0:
                ic = -1
                break
            ic = int(nxt)
        if ic < 0:
            out[i] = np.nan
            continue
        # barycentric (interpolate_triangle, :529-551)
        pc = p_cells[ic]
        a0 = 0.5 * np.linalg.norm(np.cross(r - pc[1], r - pc[2]))
        a1 = 0.5 * np.linalg.norm(np.cross(r - pc[2], r - pc[0]))
        a2 = 0.5 * np.linalg.norm(np.cross(r - pc[0], r - pc[1]))
        w = np.array([a0, a1, a2]) / areas[ic]
        out[i] = w @ v_cells[ic]
    dt = time.perf_counter() - t0
    err = np.nanmax(np.abs(out - (q.sum(axis=1) + 1.0)))
    assert err < 1e-9, f"serial walk drifted: {err}"
    return len(q) / dt, err


def vectorized_cpu_qps(points, cells, neighbors, values, queries,
                       repeats=3):
    """Single-core numpy brute-force + barycentric over the full batch."""
    centers, normals, offsets, areas = _build_serial_mesh(
        points, cells, neighbors
    )
    n_cells = cells.shape[0]
    nmat = normals.reshape(n_cells * 3, 3)
    offs = offsets.reshape(-1)
    p_cells = points[cells]
    v_cells = values[cells]

    def run(q):
        margins = (offs[None, :] - q @ nmat.T).reshape(len(q), n_cells, 3)
        m = margins.min(axis=2)
        ic = np.argmax(m, axis=1)
        pc = p_cells[ic]
        a0 = 0.5 * np.linalg.norm(
            np.cross(q - pc[:, 1], q - pc[:, 2]), axis=1
        )
        a1 = 0.5 * np.linalg.norm(
            np.cross(q - pc[:, 2], q - pc[:, 0]), axis=1
        )
        a2 = 0.5 * np.linalg.norm(
            np.cross(q - pc[:, 0], q - pc[:, 1]), axis=1
        )
        w = np.stack([a0, a1, a2], axis=1) / areas[ic][:, None]
        return (w * v_cells[ic]).sum(axis=1)

    out = run(queries[:1000])  # warm numpy/BLAS
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(queries)
        best = min(best, time.perf_counter() - t0)
    err = np.abs(out - (queries.sum(axis=1) + 1.0)).max()
    assert err < 1e-9, f"vectorized baseline drifted: {err}"
    return len(queries) / best, err


def compiled_serial_qps(points, cells, neighbors, values, queries,
                        sample=500_000):
    """The compiled C++ serial oracle (native/serial_oracle.cc) on the
    same cold protocol: exact nearest-point seed + neighbor walk +
    barycentric interpolation, single core at g++ -O3 — the closest
    available stand-in for a locally built Fortran benchmark.f90.
    Returns (qps, vals) or (None, None) when no toolchain is present."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".."))
    from interpolate_unstructured_tpu.utils import serial_oracle

    if not serial_oracle.available():
        return None, None
    q = queries[:sample]
    # warm (page in the code + mesh build once)
    serial_oracle.serial_query(points, cells, neighbors, values, q[:1000])
    t0 = time.perf_counter()
    vals, ic, found = serial_oracle.serial_query(
        points, cells, neighbors, values, q
    )
    dt = time.perf_counter() - t0
    assert found.all(), "serial oracle must resolve the in-domain protocol"
    return q.shape[0] / dt, vals


def measure(points, cells, neighbors, values, queries):
    """All brackets on the given mesh/protocol; returns a dict."""
    s_qps, _ = serial_walk_qps(points, cells, neighbors, values, queries)
    v_qps, _ = vectorized_cpu_qps(points, cells, neighbors, values, queries)
    c_qps, _ = compiled_serial_qps(points, cells, neighbors, values, queries)
    out = {"serial_qps": s_qps, "vectorized_cpu_qps": v_qps}
    if c_qps is not None:
        out["compiled_serial_qps"] = c_qps
    return out
