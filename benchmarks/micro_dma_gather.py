"""Microbench: in-kernel Pallas DMA row gather vs XLA gather + re-read.

The cold candidate path's dominant HBM traffic is the row gather: XLA's
``table[idx]`` materializes a (B, W) buffer (1 KB/row read + 1 KB/row
write) that the Pallas candidate kernel then re-reads (another
1 KB/row) — ~3x the intrinsic traffic.  If the kernel gathers its own
rows with per-row async DMAs (per-tile indices in SMEM, table left in
HBM), traffic drops to ~1x.  Whether that wins depends on the per-
descriptor DMA issue cost, which this measures:

  * xla:    table[idx] then a Pallas pass over the gathered buffer
            (the current production shape)
  * dma:    one Pallas kernel, per-row ``make_async_copy`` from the
            HBM-resident table into VMEM scratch, then the same reduce

Run on the real TPU:  python benchmarks/micro_dma_gather.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 1_000_000
B = 1_000_000
TILE = 512
GROUP = 64  # DMAs in flight per wait-batch


def build_dma_gather(w, tile=TILE, group=GROUP):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        def copy(i, base):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[base + i]],
                scratch.at[base + i],
                sems.at[i],
            )

        def body(g, _):
            base = g * group
            lax.fori_loop(
                0, group, lambda i, c: (copy(i, base).start(), c)[1], 0
            )
            lax.fori_loop(
                0, group, lambda i, c: (copy(i, base).wait(), c)[1], 0
            )
            return 0

        lax.fori_loop(0, tile // group, body, 0)
        # consume the rows: sum each (cheap VPU reduce, like the real
        # kernel's containment math)
        out_ref[:] = jnp.sum(scratch[:], axis=1, keepdims=True).T

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tile, w), jnp.float32),
                pltpu.SemaphoreType.DMA((group,)),
            ],
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        )(idx, table)

    return run


def build_xla_gather(w, tile=TILE):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    def kernel(g_ref, out_ref):
        out_ref[:] = jnp.sum(g_ref[:], axis=1, keepdims=True).T

    @jax.jit
    def run(table, idx):
        g = table[idx]
        return pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        )(g)

    return run


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from interpolate_unstructured_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(7)
    idx0 = jnp.asarray(rng.integers(0, N_ROWS, size=B), dtype=jnp.int32)

    for w in (128, 256):
        table = jnp.ones((N_ROWS, w), dtype=jnp.float32)
        for name, build in (("xla", build_xla_gather),
                            ("dma", build_dma_gather)):
            run = build(w)

            @jax.jit
            def chain(table, idx, n):
                def body(i, carry):
                    idx, acc = carry
                    out = run(table, idx)
                    # row sums equal w (all-ones table) but are data-
                    # dependent as far as XLA can prove: the next
                    # iteration's indices depend on this gather
                    step = out[0, :].astype(jnp.int32)
                    return ((idx + step) % N_ROWS, acc + out[0, 0])

                _, acc = lax.fori_loop(
                    0, n, body, (idx, jnp.zeros((), jnp.float32))
                )
                return acc

            try:
                float(chain(table, idx0, 1))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"row_bytes": w * 4, "mode": name,
                                  "error": str(e)[:300]}), flush=True)
                continue

            def timed(n):
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(chain(table, idx0, n))
                    best = min(best, time.perf_counter() - t0)
                return best

            dt = (timed(21) - timed(1)) / 20
            bw = B * w * 4 / dt / 1e9
            print(json.dumps({"row_bytes": w * 4, "mode": name,
                              "ms_per_1M": round(dt * 1e3, 2),
                              "payload_GB_s": round(bw, 1)}), flush=True)


if __name__ == "__main__":
    main()
