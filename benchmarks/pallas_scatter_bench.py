"""A/B the Pallas scatter/gather kernels against XLA's row primitives.

The round-4 cliff: XLA scatter-add is ~37 ns/row below ~350k table
rows and ~98 ns/row above (rowcost_vs_V_r04.jsonl), keyed on the
program's scattered-into row count, immune to XLA-space workarounds.
This harness measures the round-5 Pallas alternatives at the step's
exact shapes:

- ``scatter_add_rows`` (sorted window-RMW pipeline) vs XLA scatter at
  V across the cliff. The Pallas number INCLUDES its XLA-side prep
  (argsort + payload reorder + padding) — it is the drop-in cost.
- ``scatter_add_matmul`` / ``gather_rows_matmul`` (MXU one-hot path)
  vs XLA at small V (wiki scale), split=1 and split=2.

Methodology follows benchmarks/row_issue.py: `window` iterations
inside one compiled scan per timed call (dispatch amortization),
distinct pre-generated ids per iteration and per rep (the shared
tunnel memoizes identical (program, inputs)), min over reps.

Run: python -m benchmarks.pallas_scatter_bench [--quick]
Appends JSONL rows to benchmarks/pallas_scatter_r05.jsonl.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial


def _time_scan(fn, make_ids, reps, sync):
    import jax
    best = float("inf")
    for r in range(reps):
        ids = make_ids(r)
        t0 = time.time()
        out = fn(ids)
        sync(out)
        best = min(best, time.time() - t0)
    return best


def measure_scatter(v, c=256, n_rows=45_696, window=16, reps=4,
                    block=2048, slots=8):
    import jax
    import jax.numpy as jnp
    from graphembedding_tpu.ops.pallas_scatter import scatter_add_rows

    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (v, c), jnp.float32)
    grads = jax.random.uniform(jax.random.fold_in(key, 1),
                               (n_rows, c), jnp.float32)

    @jax.jit
    def ids_for(key):
        return jax.random.randint(key, (window, n_rows), 0, v, jnp.int32)

    @jax.jit
    def xla_scan(table, ids):
        def step(tbl, ids_i):
            return tbl.at[ids_i].add(grads), None
        tbl, _ = jax.lax.scan(step, table, ids)
        return tbl

    @partial(jax.jit, static_argnames=())
    def pallas_scan(table, ids):
        def step(tbl, ids_i):
            return scatter_add_rows(tbl, ids_i, grads, block=block,
                                    window=slots), None
        tbl, _ = jax.lax.scan(step, table, ids)
        return tbl

    def sync(x):
        import jax.numpy as jnp
        float(jnp.asarray(x).ravel()[:1].sum())

    # correctness probe once per shape (single step)
    ids0 = ids_for(key)[0]
    ref = table.at[ids0].add(grads)
    got = scatter_add_rows(table, ids0, grads, block=block, window=slots)
    err = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())

    out = {"v": v, "c": c, "rows": n_rows, "block": block,
           "slots": slots, "pallas_relerr": err}
    for name, fn in [("xla", xla_scan), ("pallas", pallas_scan)]:
        # warm compile
        sync(fn(table, ids_for(key)))
        dt = _time_scan(lambda ids: fn(table, ids),
                        lambda r: ids_for(jax.random.fold_in(key, 100 + r)),
                        reps, sync)
        out[f"{name}_ns_per_row"] = round(dt / (window * n_rows) * 1e9, 2)
    return out


def measure_matmul(v, c=256, n_rows=45_696, window=16, reps=4,
                   block=2048):
    import jax
    import jax.numpy as jnp
    from graphembedding_tpu.ops.pallas_scatter import (
        gather_rows_matmul, scatter_add_matmul)

    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (v, c), jnp.float32)
    grads = jax.random.uniform(jax.random.fold_in(key, 1),
                               (n_rows, c), jnp.float32)

    @jax.jit
    def ids_for(key):
        return jax.random.randint(key, (window, n_rows), 0, v, jnp.int32)

    def sync(x):
        import jax.numpy as jnp
        float(jnp.asarray(x).ravel()[:1].sum())

    out = {"v": v, "c": c, "rows": n_rows, "block": block}

    @jax.jit
    def xla_gather_scan(table, ids):
        def step(acc, ids_i):
            return acc + table[ids_i].sum(axis=0)[:1], None
        acc, _ = jax.lax.scan(step, jnp.zeros((1,), jnp.float32), ids)
        return acc

    @jax.jit
    def xla_scatter_scan(table, ids):
        def step(tbl, ids_i):
            return tbl.at[ids_i].add(grads), None
        tbl, _ = jax.lax.scan(step, table, ids)
        return tbl

    sync(xla_gather_scan(table, ids_for(key)))
    out["xla_gather_ns_per_row"] = round(_time_scan(
        lambda ids: xla_gather_scan(table, ids),
        lambda r: ids_for(jax.random.fold_in(key, 100 + r)),
        reps, sync) / (window * n_rows) * 1e9, 2)
    sync(xla_scatter_scan(table, ids_for(key)))
    out["xla_scatter_ns_per_row"] = round(_time_scan(
        lambda ids: xla_scatter_scan(table, ids),
        lambda r: ids_for(jax.random.fold_in(key, 100 + r)),
        reps, sync) / (window * n_rows) * 1e9, 2)

    for split in (1, 2):
        @jax.jit
        def g_scan(table, ids, split=split):
            def step(acc, ids_i):
                rows = gather_rows_matmul(table, ids_i, block=block,
                                          split=split)
                return acc + rows.sum(axis=0)[:1], None
            acc, _ = jax.lax.scan(step, jnp.zeros((1,), jnp.float32), ids)
            return acc

        @jax.jit
        def s_scan(table, ids, split=split):
            def step(tbl, ids_i):
                return scatter_add_matmul(tbl, ids_i, grads,
                                          block=block, split=split), None
            tbl, _ = jax.lax.scan(step, table, ids)
            return tbl

        ids0 = ids_for(key)[0]
        gerr = float(jnp.abs(
            gather_rows_matmul(table, ids0, block=block, split=split)
            - table[ids0]).max())
        serr = float(jnp.abs(
            scatter_add_matmul(table, ids0, grads, block=block,
                               split=split)
            - table.at[ids0].add(grads)).max())
        out[f"mm{split}_gather_err"] = round(gerr, 6)
        out[f"mm{split}_scatter_err"] = round(serr, 6)
        sync(g_scan(table, ids_for(key)))
        out[f"mm{split}_gather_ns_per_row"] = round(_time_scan(
            lambda ids: g_scan(table, ids),
            lambda r: ids_for(jax.random.fold_in(key, 200 + r)),
            reps, sync) / (window * n_rows) * 1e9, 2)
        sync(s_scan(table, ids_for(key)))
        out[f"mm{split}_scatter_ns_per_row"] = round(_time_scan(
            lambda ids: s_scan(table, ids),
            lambda r: ids_for(jax.random.fold_in(key, 200 + r)),
            reps, sync) / (window * n_rows) * 1e9, 2)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", default="benchmarks/pallas_scatter_r05.jsonl")
    p.add_argument("--mode", default="all",
                   choices=["all", "rmw", "matmul"])
    args = p.parse_args()

    results = []
    if args.mode in ("all", "rmw"):
        vs = [1_000_000] if args.quick else [125_000, 500_000, 1_000_000]
        for v in vs:
            r = measure_scatter(v)
            print(json.dumps(r), flush=True)
            results.append(r)
    if args.mode in ("all", "matmul"):
        for v in ([2405] if args.quick else [2405, 10_312]):
            r = measure_matmul(v)
            print(json.dumps(r), flush=True)
            results.append(r)
    with open(args.out, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
