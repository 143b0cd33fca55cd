"""Can hand-issued multi-row DMA beat XLA's scattered row gather?

The SGNS roofline account (utils/profiling.py) names one untried
lever for the last ~25% to the pipelined ceiling: a hand-scheduled
fused kernel whose DMA batching beats XLA's per-row issue rate. This
microbenchmark isolates exactly that primitive: gather N random rows
of a [V, W] f32 table resident in HBM,

  (a) XLA:    out = table[ids]
  (b) Pallas: grid over blocks of B rows; each step issues B
      outstanding row DMAs (HBM -> VMEM output block) against
      scalar-prefetched ids, waits, and lets the pipeline write the
      block back.

If (b) is not materially faster than (a), the fused-kernel lever is
closed with data; if it is, it motivates building the full
gather->compute->scatter kernel.

Run: python -m benchmarks.dma_gather  (TPU via tunnel)
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def pallas_row_gather(table, ids, *, block_rows=16):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, W = table.shape
    N = ids.shape[0]
    B = block_rows
    assert N % B == 0

    def kernel(ids_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)
        for j in range(B):  # unrolled: B outstanding row DMAs
            pltpu.make_async_copy(
                table_ref.at[pl.ds(ids_ref[i * B + j], 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j],
            ).start()
        for j in range(B):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(ids_ref[i * B + j], 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j],
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (B, W), lambda i, ids: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((B,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, W), table.dtype),
        grid_spec=grid_spec,
    )(ids, table)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--gather", type=int, default=1 << 16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--block-rows", type=int, nargs="+",
                    default=[8, 16, 32])
    args = ap.parse_args()

    V, W, N = args.rows, args.width, args.gather
    table = jax.random.normal(jax.random.PRNGKey(0), (V, W))
    table = jax.device_put(table)

    @jax.jit
    def xla_gather(table, ids):
        return table[ids]

    def time_fn(fn, tag):
        best = float("inf")
        for r in range(args.reps + 1):
            ids = jax.random.randint(
                jax.random.PRNGKey(10 + r), (N,), 0, V, dtype=jnp.int32
            )
            t0 = time.time()
            out = fn(table, ids)
            _ = float(out[0, 0]) + float(out[-1, -1])
            dt = time.time() - t0
            if r > 0:
                best = min(best, dt)
        row = {"variant": tag, "rows_gathered": N, "width": W,
               "table_rows": V, "best_s": round(best, 5),
               "ns_per_row": round(best / N * 1e9, 2)}
        print(json.dumps(row), flush=True)
        return best

    time_fn(xla_gather, "xla_take")
    for B in args.block_rows:
        try:
            fn = functools.partial(pallas_row_gather, block_rows=B)
            time_fn(jax.jit(fn), f"pallas_dma_b{B}")
        except Exception as e:
            print(json.dumps({"variant": f"pallas_dma_b{B}",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
