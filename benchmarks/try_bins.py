"""Can finer candidate bins cut the worst-bin count below 20?

At 19 quantized tet candidates a cover row fits 256 floats (1 KB
stride) instead of the current K=24 / 1536 B: read-touch would drop
7.6 -> 5.8 ms/1M (sweep_chunk stride table).  ANSWER (round 4): NO —
the worst-bin count is the mesh's per-vertex cell incidence (24 for
the 6-tets-per-cube lattice): any bin containing a mesh vertex
intersects every tet incident to it, so refining bins shrinks the
AVERAGE count but never the maximum.  Measured on the 1M-cell bench
mesh: worst = 24 (and the 99.9th-percentile bin is ALSO 24) at every
bins-per-cell in {2.2, 2.4, 2.8, 3.2}.

Default mode rebuilds only the candidate BIN LISTS (cheap) and reports
the count distribution; --full also repacks tables and times the fused
query (several GB of device memory — it OOMs alongside a loaded grid
on v5e, which is how round 4 left it).

    python benchmarks/try_bins.py [--full] [bpc ...]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "cache", "tet55_f32.binda")


def counts_only(bpcs):
    import jax.numpy as jnp

    from interpolate_unstructured_tpu.io.binda import read_binda
    from interpolate_unstructured_tpu.models.grid import (
        _make_cover_ok,
        build_candidate_bins_dispatch,
        candidate_row_capacity,
    )
    from interpolate_unstructured_tpu.utils.config import (
        IUConfig,
        resolve_config,
    )

    bf = read_binda(CACHE)
    arr = {}
    for i, e in enumerate(bf.entries):
        name = e.name.split("/")[-1]
        if name in ("cell_points", "face_normals", "face_offsets",
                    "rmin", "rmax"):
            arr[name] = bf.read(i).astype(e.metadata)

    for bpc in bpcs:
        cfg0 = dataclasses.replace(IUConfig(), cand_bins_per_cell=bpc)
        cfg = resolve_config(cfg0, np.float32, arr["rmin"], arr["rmax"])
        k_max, nv = candidate_row_capacity("tetra", jnp.float32, cfg, 1)
        cover_ok = _make_cover_ok("tetra", jnp.float32, cfg, nv, k_max)
        t0 = time.time()
        ids, count, shape, *_ = build_candidate_bins_dispatch(
            arr["cell_points"].astype(np.float64),
            arr["face_normals"].astype(np.float64),
            arr["face_offsets"].astype(np.float64),
            arr["rmin"].astype(np.float64),
            arr["rmax"].astype(np.float64),
            3, k_max, jnp.float32, cfg, cover_ok=cover_ok,
        )
        c = np.asarray(count)
        print(f"bpc {bpc}: {time.time()-t0:.0f}s shape={shape} "
              f"bins={np.prod(shape)/1e6:.2f}M worst={int(c.max())} "
              f"K={ids.shape[1]} q99.9={int(np.quantile(c, 0.999))} "
              f"mean={c.mean():.1f}", flush=True)
        del ids, count


def full(bpcs):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.io.checkpoint import load_grid
    from interpolate_unstructured_tpu.ops import locate
    from interpolate_unstructured_tpu.utils.config import IUConfig

    rng = np.random.default_rng(2)
    r_np = rng.random((1_000_000, 3))

    def chain(fn, *args, n0=1, n1=6):
        jfn = jax.jit(fn)
        float(jfn(*args, n0))

        def timed(n):
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(jfn(*args, n))
                best = min(best, time.perf_counter() - t0)
            return best

        return max((timed(n1) - timed(n0)) / (n1 - n0), 1e-9)

    for bpc in bpcs:
        cfg = dataclasses.replace(IUConfig(), cand_bins_per_cell=bpc)
        t0 = time.perf_counter()
        grid = load_grid(CACHE, config=cfg)
        print(f"bpc {bpc}: rebuild {time.perf_counter()-t0:.0f}s, "
              f"K={grid.cand_ids.shape[1]} "
              f"worst={int(np.asarray(grid.cand_count).max())} "
              f"row={grid.cand_table.shape[1]*4}B", flush=True)
        r = jnp.asarray(r_np, grid.dtype)

        def fused(grid, r, n):
            def body(i, carry):
                r, acc = carry
                ic, found, vals = locate._candidates_query(grid, r, (0,))
                dep = r + (5e-30 * vals[0].sum()) * jnp.ones_like(r)
                return (dep, acc + vals[0, 0])

            _, acc = lax.fori_loop(
                0, n, body, (r, jnp.zeros((), grid.dtype))
            )
            return acc

        t = chain(fused, grid, r)
        print(f"  fused interp: {t*1e3:6.2f} ms/1M ({1e6/t:.3e} q/s)",
              flush=True)
        del grid


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--full"]
    bpcs = [float(a) for a in args] or [2.2, 2.4, 2.8, 3.2]
    if "--full" in sys.argv:
        full(bpcs)
    else:
        counts_only(bpcs)
