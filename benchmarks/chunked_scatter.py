"""Probe the chunked-table scatter strategy against the >350k-row cliff.

`benchmarks/rowcost_vs_V_r04.jsonl` localized a sharp scatter-add
regime switch: tables above ~350k rows (C=256 fp32) pay ~98 ns/row
while tables below pay 37-54 ns/row, flat above the cliff and
slowly-growing below it. If the regime is keyed on the SCATTER
TARGET's operand size (not total live memory), storing a V=1M table
as K sub-350k chunks and routing each gradient row to its chunk
should buy back the fast regime at the price of one bucketing pass
(argsort by chunk + padded compaction, the dense-bucket trick from
`parallel/walks.py::bucket_by_dest`).

This microbench measures exactly that at the trainer step's shapes:
  - baseline: one [1M, 256] table, 45,696-row scatter-add (slow regime)
  - chunked:  K x [1M/K, 256] tables, same rows bucketed to
    [K, cap] padded buckets (cap = padfactor * rows/K, overflow rows
    dropped - acceptable in a probe; the trainer would retry or cap),
    one scatter-add per chunk.

Run: python -m benchmarks.chunked_scatter [--v 1000000] [--k 4]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import time


def measure(v=1_000_000, c=256, n_rows=45_696, k=4, padfactor=1.25,
            reps=4, window=32):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    # ceil so ids in the v % k tail still map to a real chunk with a
    # correct local index (ADVICE r4: floor folded the tail into the
    # last chunk's bucket with a wrong local row); the last chunk is
    # simply partially used.
    chunk_rows = -(-v // k)
    cap = int(padfactor * n_rows / k)
    grads = jax.random.uniform(jax.random.fold_in(key, 1),
                               (n_rows, c), jnp.float32)

    @jax.jit
    def ids_for(key):
        return jax.random.randint(key, (window, n_rows), 0, v, jnp.int32)

    # --- baseline: monolithic table ---
    table = jax.random.uniform(key, (v, c), jnp.float32)

    @jax.jit
    def mono_scan(table, ids):
        def step(tbl, ids_i):
            return tbl.at[ids_i].add(grads), None
        tbl, _ = jax.lax.scan(step, table, ids)
        return tbl

    # --- chunked: K tables of v/k rows each, bucketed scatter ---
    chunks = tuple(
        jax.random.uniform(jax.random.fold_in(key, 10 + i),
                           (chunk_rows, c), jnp.float32)
        for i in range(k)
    )

    @jax.jit
    def chunked_scan(chunks, ids):
        def step(chs, ids_i):
            dest = ids_i // chunk_rows            # chunk index per row
            local = ids_i - dest * chunk_rows     # row within chunk
            # group rows by chunk: one argsort, then per-chunk padded
            # windows over the sorted order (no intermediate scatter -
            # the grads reach each chunk's scatter via a cheap gather)
            order = jnp.argsort(dest)             # groups chunks
            sorted_dest = dest[order]
            starts = jnp.searchsorted(sorted_dest, jnp.arange(k),
                                      side="left")
            counts = jnp.diff(jnp.append(starts, n_rows))
            lanes = jnp.arange(cap)
            new = []
            for i in range(k):
                valid = lanes < counts[i]         # overflow dropped
                idx = order[jnp.clip(starts[i] + lanes, 0, n_rows - 1)]
                li = jnp.where(valid, local[idx], 0)
                ri = jnp.where(valid[:, None], grads[idx], 0.0)
                new.append(chs[i].at[li].add(ri))
            return tuple(new), None
        chs, _ = jax.lax.scan(step, chunks, ids)
        return chs

    ids0 = ids_for(key)
    _ = float(mono_scan(table, ids0)[0, 0])
    _ = float(chunked_scan(chunks, ids0)[0][0, 0])

    def time_best(fn, state):
        best = float("inf")
        for r in range(reps):
            ids = ids_for(jax.random.fold_in(key, 1000 + r))
            _ = int(ids[0, 0])
            t0 = time.time()
            out = fn(state, ids)
            leaf = out[0] if isinstance(out, tuple) else out
            _ = float(leaf[0, 0])
            best = min(best, (time.time() - t0) / window)
        return best

    t_mono = time_best(mono_scan, table)
    t_chunk = time_best(chunked_scan, chunks)
    return (t_mono / n_rows * 1e9, t_chunk / n_rows * 1e9, cap)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--v", type=int, default=1_000_000)
    p.add_argument("--c", type=int, default=256)
    p.add_argument("--rows", type=int, default=45_696)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--padfactor", type=float, default=1.25)
    args = p.parse_args()
    mono_ns, chunk_ns, cap = measure(
        args.v, args.c, args.rows, args.k, args.padfactor)
    print(json.dumps({
        "v": args.v, "c": args.c, "rows": args.rows, "k": args.k,
        "cap": cap,
        "mono_scatter_ns_per_row": round(mono_ns, 2),
        "chunked_scatter_ns_per_row": round(chunk_ns, 2),
        "speedup": round(mono_ns / chunk_ns, 3),
    }))


if __name__ == "__main__":
    main()
