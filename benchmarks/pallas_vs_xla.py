"""A/B the fused Pallas SGNS kernel against the XLA einsum path on TPU.

Decides `use_pallas`'s default (train/skipgram.py). Measured 2026-08-20
on one v5e chip via tunnel, wiki-scale corpus, default config
(neg_share_packs=4 now supported by the kernel): XLA 157.1 M pairs/s vs
Pallas 140.9 M — XLA stays the default; bench.py reports the measured
rate against the serial-floor / row-traffic-ceiling bracket instead
(utils/profiling.sgns_roofline, constants from benchmarks/row_issue.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/pallas_vs_xla.py
"""

import time
import numpy as np
import jax, jax.numpy as jnp
from graphembedding_tpu.data import load_dataset
from graphembedding_tpu.ops.walk import simulate_walks
from graphembedding_tpu.train.skipgram import (
    SkipGramConfig, corpus_counts, negative_table, sgns_block_chunk)

ds = load_dataset("wiki")
g = ds.graph
walks = simulate_walks(g, 80, 10, jax.random.PRNGKey(0))
cfg = SkipGramConfig()
table = jnp.asarray(negative_table(corpus_counts(np.asarray(walks), g.num_nodes)))
S, Bw = cfg.chunk_steps, cfg.block_walks

for use_pallas in (False, True):
    w_in = (jax.random.uniform(jax.random.PRNGKey(1), (g.num_nodes, 128)) - 0.5) / 128
    w_out = jnp.zeros((g.num_nodes, 128))
    def chunk(w_in, w_out, t):
        return sgns_block_chunk(
            w_in, w_out, walks, table, jax.random.PRNGKey(2),
            jnp.float32(cfg.alpha), jnp.float32(cfg.min_alpha),
            jnp.int32(t), jnp.float32(10000.0),
            chunk_steps=S, block_walks=Bw, window=cfg.window,
            negative=cfg.negative, k_shared=cfg.k_shared,
            neg_share_walks=cfg.neg_share_walks,
            neg_share_packs=cfg.neg_share_packs,
            use_pallas=use_pallas)
    w_in, w_out, l, pairs = chunk(w_in, w_out, 0)
    _ = float(l.mean())
    best = []
    t = S
    for r in range(3):
        t0 = time.time(); acc = []
        for c in range(8):
            w_in, w_out, l, pairs = chunk(w_in, w_out, t); acc.append(pairs); t += S
        tp = float(jnp.sum(jnp.stack([p.sum() for p in acc])))
        best.append((time.time() - t0, tp))
    dt, tp = min(best)
    print(f"use_pallas={use_pallas}: {tp/dt/1e6:.1f} M pairs/s")
