"""Scaling-efficiency harness (BASELINE report deliverable).

Measures walked-edges/s and trained-pairs/s of the SHARDED paths at
1..N devices and reports efficiency vs linear scaling, as JSONL.

On this build environment only one real TPU chip is reachable, so the
multi-device rows run on the virtual CPU mesh
(`--xla_force_host_platform_device_count`) — they validate the
collective code path and communication/computation *structure*, not
absolute speed. On a real pod slice the same harness runs unchanged:
`python -m benchmarks.scaling --devices 8` on the host with
`jax.distributed` initialized.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=0,
                   help="force N virtual CPU devices (0 = use real)")
    p.add_argument("--walks", type=int, default=20000)
    p.add_argument("--length", type=int, default=10)
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--out", default=None, help="JSONL output path")
    args = p.parse_args()

    if args.devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    if args.devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from graphembedding_tpu.data import load_dataset
    from graphembedding_tpu.ops.walk import simulate_walks
    from graphembedding_tpu.parallel.mesh import make_mesh
    from graphembedding_tpu.parallel.sgns import sharded_sgns_chunk
    from graphembedding_tpu.train.skipgram import (
        corpus_counts,
        negative_table,
    )

    ds = load_dataset("wiki")
    g = ds.graph
    n_all = len(jax.devices())
    rows = []

    walks = simulate_walks(g, 10, args.length, jax.random.PRNGKey(0))
    walks_np = np.asarray(walks)
    table = jnp.asarray(negative_table(corpus_counts(walks_np,
                                                     g.num_nodes)))

    sizes = [n for n in [1, 2, 4, 8, n_all] if n <= n_all]
    sizes = sorted(set(sizes))
    base_rate = None
    for n in sizes:
        mesh = make_mesh((n, 1), devices=jax.devices()[:n])
        S, bw = 16, 32 * n
        fn = sharded_sgns_chunk(
            mesh, chunk_steps=S, block_walks=bw, window=5, negative=5,
            k_shared=32, neg_share_walks=8,
        )
        w_in = (jax.random.uniform(jax.random.PRNGKey(1),
                                   (g.num_nodes, 128)) - 0.5) / 128
        w_out = jnp.zeros((g.num_nodes, 128))
        with mesh:
            w_in, w_out, l = fn(w_in, w_out, walks, table,
                                jax.random.PRNGKey(2), jnp.float32(0.025),
                                jnp.float32(1e-4), jnp.int32(0),
                                jnp.float32(1000.0))
            _ = float(l.mean())
            t0 = time.time()
            t = S
            for c in range(args.chunks):
                w_in, w_out, l = fn(w_in, w_out, walks, table,
                                    jax.random.PRNGKey(2),
                                    jnp.float32(0.025), jnp.float32(1e-4),
                                    jnp.int32(t), jnp.float32(1000.0))
                t += S
            _ = float(l.mean())
            dt = time.time() - t0
        # walks actually trained per step: per-device slice rounded
        # down to whole packing groups (P = 128 // L walks per group)
        pk = max(min(128 // args.length, bw // n), 1)
        bw_used = ((bw // n) // pk) * pk * n
        # ~56 valid pairs per wiki walk at window 5 (measured)
        pairs = args.chunks * S * bw_used * 56
        rate = pairs / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        row = {
            "devices": n,
            "pairs_per_s": round(rate),
            "scaling_efficiency": round(eff, 3),
            "seconds": round(dt, 3),
        }
        rows.append(row)
        print(json.dumps(row))

    # row-sharded mode (one global table, exchange per step) at full n
    from graphembedding_tpu.parallel.rowshard import rowsharded_sgns_chunk

    n = sizes[-1]
    mesh = make_mesh((n, 1), devices=jax.devices()[:n])
    S, bw = 16, 32 * n
    Vp = ((g.num_nodes + n - 1) // n) * n
    w_cat = jnp.zeros((Vp, 256), jnp.float32)
    w_cat = w_cat.at[: g.num_nodes, :128].set(
        (jax.random.uniform(jax.random.PRNGKey(1),
                            (g.num_nodes, 128)) - 0.5) / 128
    )
    fn = rowsharded_sgns_chunk(
        mesh, chunk_steps=S, block_walks=bw, window=5, negative=5,
        k_shared=32,
    )
    with mesh:
        w_cat, l = fn(w_cat, walks, table, jax.random.PRNGKey(2),
                      jnp.float32(0.025), jnp.float32(1e-4),
                      jnp.int32(0), jnp.float32(1000.0))
        _ = float(l.mean())
        t0 = time.time()
        t = S
        for c in range(args.chunks):
            w_cat, l = fn(w_cat, walks, table, jax.random.PRNGKey(2),
                          jnp.float32(0.025), jnp.float32(1e-4),
                          jnp.int32(t), jnp.float32(1000.0))
            t += S
        _ = float(l.mean())
        dt = time.time() - t0
    pk = max(min(128 // args.length, bw // n), 1)
    bw_used = ((bw // n) // pk) * pk * n
    pairs = args.chunks * S * bw_used * 56
    row = {
        "devices": n,
        "mode": "rowshard",
        "pairs_per_s": round(pairs / dt),
        "seconds": round(dt, 3),
    }
    rows.append(row)
    print(json.dumps(row))

    # distributed walk engine (edge-partitioned CSR + bucketed
    # all_to_all walker routing): walked-edges/s at 1..N devices —
    # the BASELINE edges/s scaling deliverable. WEAK scaling (walkers
    # per device held constant), like the training rows: the virtual
    # CPU mesh time-shares one set of physical cores, so
    # strong-scaling wall times cannot improve there and only weak
    # scaling exposes the routing overhead the harness exists to
    # validate. On a real slice both framings run unchanged.
    from graphembedding_tpu.parallel.walks import (
        simulate_walks_distributed,
    )

    base_rate = None
    for n in sizes:
        mesh = make_mesh((n, 1), devices=jax.devices()[:n])
        nw = 5 * n  # walkers/device constant
        # warm/compile
        w, ov = simulate_walks_distributed(
            g, mesh, nw, args.length, jax.random.PRNGKey(3)
        )
        t0 = time.time()
        w, ov = simulate_walks_distributed(
            g, mesh, nw, args.length, jax.random.PRNGKey(4)
        )
        dt = time.time() - t0
        edges = int(np.sum(np.asarray(w) >= 0) - w.shape[0])
        rate = edges / dt
        if base_rate is None:
            base_rate = rate
        row = {
            "devices": n,
            "mode": "distributed_walks_weak",
            "walked_edges_per_s": round(rate),
            "scaling_efficiency": round(rate / (base_rate * n), 3),
            "overflow": ov,
            "seconds": round(dt, 3),
        }
        rows.append(row)
        print(json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
