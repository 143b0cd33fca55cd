"""Dense expected-SGNS trainer (train/dense.py) — round-3 capability.

The closed-form full-batch factorization of the SGNS objective: exact
expected co-occurrence weights (dynamic-window expectation), rank-1
expected negatives, Adam on MXU matmuls.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphembedding_tpu.data.datasets import (
    synthetic_wiki,
    synthetic_wiki_hard,
)
from graphembedding_tpu.eval.classify import Classifier
from graphembedding_tpu.models import DeepWalk
from graphembedding_tpu.ops.walk import simulate_walks
from graphembedding_tpu.train.dense import (
    DenseSGNSTrainer,
    cooccurrence,
)


def test_cooccurrence_matches_bruteforce():
    """C equals the brute-force expected window-pair counts, pads
    excluded."""
    walks = np.array([[0, 1, 2, -1], [2, 2, 0, 1]], np.int32)
    V, W = 3, 2
    C = np.asarray(cooccurrence(jnp.asarray(walks), num_nodes=V,
                                window=W))
    expect = np.zeros((V, V))
    for row in walks:
        toks = row[row >= 0]
        for i in range(len(toks)):
            for j in range(len(toks)):
                d = abs(i - j)
                if 1 <= d <= W:
                    expect[toks[i], toks[j]] += (W - d + 1) / W
    np.testing.assert_allclose(C, expect, rtol=1e-6)


def test_dense_trainer_community_gate():
    ds = synthetic_wiki(num_nodes=120, num_classes=3, avg_degree=8,
                        seed=5)
    m = DeepWalk(ds.graph, walk_length=10, num_walks=20, seed=0)
    m.train(embed_size=32, window_size=5, trainer="dense", steps=100)
    res = Classifier(m.get_embeddings()).split_train_evaluate(
        ds.X, ds.Y, 0.8
    )
    assert res["micro"] >= 0.9, res["micro"]


def test_dense_trainer_hard_sbm_gate():
    """Must also clear the near-threshold gate the sampled trainer is
    held to (within a small margin — the dense objective is the same
    expectation)."""
    ds = synthetic_wiki_hard()
    walks = simulate_walks(ds.graph, 20, 10, jax.random.PRNGKey(0))
    w_in, _, _ = DenseSGNSTrainer(embed_size=64, steps=150).fit(
        walks, ds.graph.num_nodes
    )
    emb = np.asarray(w_in)
    e = {ds.graph.vocab.idx2node[i]: emb[i]
         for i in range(ds.graph.num_nodes)}
    r = Classifier(e).split_train_evaluate(ds.X, ds.Y, 0.8, seed=0)
    assert r["micro"] >= 0.5, r["micro"]


def test_dense_trainer_guards():
    with pytest.raises(ValueError):
        DenseSGNSTrainer(max_nodes=64).fit(
            np.zeros((4, 5), np.int32), 100
        )
    ds = synthetic_wiki(num_nodes=30, num_classes=2, avg_degree=4,
                        seed=1)
    m = DeepWalk(ds.graph, walk_length=4, num_walks=2)
    with pytest.raises(ValueError):
        m.train(trainer="dense", hs=1)
    with pytest.raises(ValueError):
        m.train(trainer="nope")


def test_line_dense_trainer():
    """LINE trainer='dense': closed-form expected objective — first
    order must separate communities at least as well as the sampled
    second-order path on the small community graph."""
    from graphembedding_tpu.models.line import LINE

    ds = synthetic_wiki(num_nodes=120, num_classes=3, avg_degree=8,
                        seed=5)
    m = LINE(ds.graph, embedding_size=32, order="all")
    m.train(trainer="dense", steps=200)
    res = Classifier(m.get_embeddings()).split_train_evaluate(
        ds.X, ds.Y, 0.8
    )
    assert res["micro"] >= 0.85, res["micro"]
    with pytest.raises(ValueError):
        m.train(trainer="nope")


def test_struc2vec_dense_trainer_quality(tmp_path):
    """The dense EXPECTED-SGNS objective closes Struc2Vec's sampled-
    SGNS quality gap (sampled ~0.70 on flight-brazil vs hs=1's ~0.93;
    dense measures 0.89/0.96/0.93 across seeds 1-3 — the deficit was
    sampling noise, not the objective). Gate one seed here."""
    from graphembedding_tpu.data.datasets import synthetic_flight
    from graphembedding_tpu.models import Struc2Vec

    ds = synthetic_flight()
    m = Struc2Vec(ds.graph, walk_length=10, num_walks=80,
                  temp_path=str(tmp_path) + "/", seed=3)
    m.train(hs=0, trainer="dense", steps=300)
    r = Classifier(m.get_embeddings()).split_train_evaluate(
        ds.X, ds.Y, 0.8, seed=0
    )
    assert r["micro"] >= 0.8, r["micro"]
