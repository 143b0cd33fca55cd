"""Reference-API walker classes (`ge/walker.py [U]` surface parity).

The framework's real walk engines are the batched device kernels in
`ops/walk.py`; these wrappers reproduce the reference's `RandomWalker` /
`BiasedWalker` classes for users migrating from it — same constructor
signatures, and `simulate_walks` returns walks as **lists of node-name
lists** (the reference's return type, fed to gensim as "sentences").
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from graphembedding_tpu.models.base import as_graph
from graphembedding_tpu.ops.walk import simulate_walks as _device_walks


def _to_sentences(walks_np: np.ndarray, vocab) -> List[List]:
    out = []
    for row in walks_np:
        out.append([vocab.idx2node[i] for i in row if i >= 0])
    return out


class RandomWalker:
    def __init__(self, G, p=1.0, q=1.0, use_rejection_sampling=0,
                 seed=0):
        self.graph = as_graph(G)
        self.p = p
        self.q = q
        self.use_rejection_sampling = use_rejection_sampling
        self.seed = seed

    def preprocess_transition_probs(self):
        """Build alias tables (device-resident; O(1)-draw, no O(E·d)
        alias_edges — the exact kernel needs none)."""
        _ = self.graph.alias
        return self

    def simulate_walks(self, num_walks, walk_length, workers=1,
                       verbose=0):
        del workers, verbose
        kind = "uniform" if (self.p == 1.0 and self.q == 1.0) else \
            "node2vec"
        walks = _device_walks(
            self.graph, num_walks, walk_length,
            jax.random.PRNGKey(self.seed), kind=kind, p=self.p, q=self.q,
            use_rejection_sampling=bool(self.use_rejection_sampling),
        )
        return _to_sentences(np.asarray(walks), self.graph.vocab)


class BiasedWalker:
    """Struc2Vec multilayer walker (reference surface).

    The reference version reads pickled alias tables from `temp_path`;
    here the context-graph layers are built (or loaded from the
    content-hash cache) by `models.struc2vec`. Prefer using the
    `Struc2Vec` model directly; this shim exists for API parity.
    """

    def __init__(self, idx2node, temp_path):
        self.idx2node = idx2node
        self.temp_path = temp_path

    def simulate_walks(self, num_walks, walk_length, stay_prob=0.3,
                       workers=1, verbose=0):
        raise NotImplementedError(
            "use graphembedding_tpu.models.Struc2Vec, which runs the "
            "multilayer walks on device (models/struc2vec.py — "
            "multilayer_walks)"
        )
