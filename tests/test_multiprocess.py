"""True multi-process execution of the multi-host input pipeline
(SURVEY.md §5.8): two jax.distributed CPU processes, 2 virtual devices
each, UNEQUAL query contributions, exercising distribute_queries'
per-process padding and collect_results' unequal-contribution trimming
(parallel/sharding.py) — the regime single-process tests cannot reach.
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


@pytest.mark.parametrize("n_procs", [2])
def test_multihost_pipeline_unequal_contributions(tmp_path, n_procs):
    coordinator = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"out{p}.npz") for p in range(n_procs)]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(n_procs), str(p),
             outs[p]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        )
        for p in range(n_procs)
    ]
    logs = []
    for p, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {p} timed out")
        logs.append(out)
        assert proc.returncode == 0, f"worker {p} failed:\n{out}"

    results = [np.load(o) for o in outs]
    # Every process must see the SAME full trimmed result
    for r in results[1:]:
        np.testing.assert_array_equal(r["vals"], results[0]["vals"])
        np.testing.assert_array_equal(r["found"], results[0]["found"])

    # Assembled result = concatenation of the per-process contributions
    # in process order, padding removed
    r_all = np.concatenate([r["r_local"] for r in results], axis=0)
    vals = results[0]["vals"]
    found = results[0]["found"]
    assert vals.shape[0] == r_all.shape[0]  # 5 + 9 = 14, not 6 + 10
    assert found.all()
    np.testing.assert_allclose(
        vals[:, 0], r_all.sum(axis=1) + 1.0, atol=1e-12
    )
