"""True multi-process execution of the multi-host pipeline
(SURVEY.md §5.8): N jax.distributed CPU processes, 2 virtual devices
each, UNEQUAL query contributions — the regime single-process tests
cannot reach.

Scenarios (round-4 verdict item 6):
* 2-process interpolation (the round-3 baseline),
* 4-process interpolation with a ZERO-contribution process
  (parallel/sharding.py's empty-block filler path),
* 2-process sharded_trace -> collect_results on TraceResult fields.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mh_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, n_procs, scenario, timeout=420):
    coordinator = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"out{p}.npz") for p in range(n_procs)]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(n_procs), str(p),
             outs[p], scenario],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        )
        for p in range(n_procs)
    ]
    for p, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {p} timed out")
        assert proc.returncode == 0, f"worker {p} failed:\n{out}"
    return [np.load(o) for o in outs]


@pytest.mark.parametrize(
    "n_procs,scenario",
    [(2, "interp"), (4, "interp_zero")],
)
def test_multihost_pipeline_unequal_contributions(
    tmp_path, n_procs, scenario
):
    results = _run_workers(tmp_path, n_procs, scenario)

    # Every process must see the SAME full trimmed result
    for r in results[1:]:
        np.testing.assert_array_equal(r["vals"], results[0]["vals"])
        np.testing.assert_array_equal(r["found"], results[0]["found"])

    # Assembled result = concatenation of the per-process contributions
    # in process order, padding removed (including the b_local = 0
    # process in interp_zero, whose contribution is empty)
    r_all = np.concatenate([r["r_local"] for r in results], axis=0)
    vals = results[0]["vals"]
    found = results[0]["found"]
    assert vals.shape[0] == r_all.shape[0]
    if scenario == "interp_zero":
        assert results[1]["r_local"].shape[0] == 0
    assert found.all()
    np.testing.assert_allclose(
        vals[:, 0], r_all.sum(axis=1) + 1.0, atol=1e-12
    )


def test_multihost_sharded_trace(tmp_path):
    results = _run_workers(tmp_path, 2, "trace")

    for r in results[1:]:
        np.testing.assert_array_equal(r["y"], results[0]["y"])
        np.testing.assert_array_equal(r["n_steps"], results[0]["n_steps"])
        np.testing.assert_array_equal(
            r["boundary_material"], results[0]["boundary_material"]
        )

    y_local = np.concatenate([r["y_local"] for r in results], axis=0)
    y = results[0]["y"]
    n_steps = results[0]["n_steps"]
    assert y.shape[0] == y_local.shape[0]  # 3 + 5 = 8 trajectories
    for b in range(y.shape[0]):
        n = min(int(n_steps[b]), y.shape[1])
        assert n > 3
        curve = y[b, :n, :2]
        np.testing.assert_allclose(curve[0], y_local[b], atol=1e-12)
        # closed orbit: every accepted point stays on the seed circle
        r_curve = np.linalg.norm(curve - 1.0, axis=1)
        np.testing.assert_allclose(r_curve, 0.5, atol=5e-3)
