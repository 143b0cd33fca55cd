"""End-to-end DeepWalk at million-node scale on one chip.

Builds a synthetic power-lawish random graph at the requested vertex
count, runs the batched uniform-walk kernel for the full corpus, then
one SGNS training pass — reporting walked edges/s and trained pairs/s
as JSON lines. This is the single-chip scale story: the reference
(pure-Python walks + gensim) does not run at this scale at all.

Usage: python -m benchmarks.million [--nodes 1000000] [--avg-degree 10]
       [--num-walks 5] [--epochs 1]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from graphembedding_tpu.graph import Graph
from graphembedding_tpu.ops.walk import simulate_walks
from graphembedding_tpu.train.skipgram import (
    SkipGramConfig,
    SkipGramTrainer,
)


def synthetic_graph(V: int, avg_degree: int, seed: int = 0) -> Graph:
    """Ring (connectivity) + random edges with a mild hub skew."""
    rng = np.random.default_rng(seed)
    ring_src = np.arange(V, dtype=np.int64)
    ring_dst = (ring_src + 1) % V
    n_rand = V * max(avg_degree - 2, 1) // 2
    src = rng.integers(0, V, n_rand)
    # quadratic skew toward low ids -> heavy-tailed degrees
    dst = (rng.random(n_rand) ** 2 * V).astype(np.int64) % V
    return Graph(
        np.concatenate([ring_src, src]),
        np.concatenate([ring_dst, dst]),
        num_nodes=V,
        directed=False,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--num-walks", type=int, default=5)
    ap.add_argument("--walk-length", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=1)
    args = ap.parse_args()
    V = args.nodes

    t0 = time.perf_counter()
    g = synthetic_graph(V, args.avg_degree)
    t_build = time.perf_counter() - t0
    print(json.dumps({
        "bench": "million_build",
        "nodes": V,
        "edges": g.num_edges,
        "seconds": round(t_build, 2),
    }), flush=True)

    # warm the walk program on the same shapes, then time a fresh key
    # (the tunnel memoizes identical (program, inputs) calls)
    t0 = time.perf_counter()
    walks = simulate_walks(
        g, args.num_walks, args.walk_length, jax.random.PRNGKey(0)
    )
    float(walks.sum())
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    walks = simulate_walks(
        g, args.num_walks, args.walk_length, jax.random.PRNGKey(1)
    )
    float(walks.sum())
    t_walk = time.perf_counter() - t0
    edges = walks.shape[0] * (walks.shape[1] - 1)
    print(json.dumps({
        "bench": "million_walks",
        "nodes": V,
        "walkers": walks.shape[0],
        "walked_edges_per_s": round(edges / t_walk),
        "seconds_warm": round(t_walk, 2),
        "seconds_cold": round(t_cold, 2),
    }), flush=True)

    cfg = SkipGramConfig(epochs=args.epochs)
    trainer = SkipGramTrainer(cfg)
    t0 = time.perf_counter()
    trainer.fit(walks, V)  # cold pass: compiles + one-time host builds
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    w_in, w_out, losses = trainer.fit(walks, V)
    float(w_in.sum())
    t_train = time.perf_counter() - t0
    print(json.dumps({
        "bench": "million_train",
        "nodes": V,
        "epochs": args.epochs,
        "seconds_warm": round(t_train, 2),
        "seconds_cold": round(t_cold, 2),
        "pairs_per_s": round(trainer.trained_pairs_ / t_train),
        "mean_loss_tail": round(float(np.asarray(losses)[-20:].mean()), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
