"""End-to-end model tests on small synthetic graphs (CPU mesh).

Mirrors the reference's de-facto integration testing (examples ending in
micro-F1, SURVEY.md §5) at a size that runs in seconds.
"""

import numpy as np
import pytest

from graphembedding_tpu.data.datasets import synthetic_flight, synthetic_wiki
from graphembedding_tpu.eval.classify import Classifier
from graphembedding_tpu.models import LINE, SDNE, DeepWalk, Node2Vec, Struc2Vec


@pytest.fixture(scope="module")
def small_sbm():
    return synthetic_wiki(num_nodes=120, num_classes=3, avg_degree=8,
                          p_in=0.85, seed=3)


def microf1(ds, embeddings):
    clf = Classifier(embeddings)
    return clf.split_train_evaluate(ds.X, ds.Y, 0.8, seed=0)["micro"]


def test_deepwalk_end_to_end(small_sbm):
    m = DeepWalk(small_sbm.graph, walk_length=10, num_walks=20)
    m.train(embed_size=32, window_size=5, iter=3, block_walks=64,
            k_shared=16)
    f1 = microf1(small_sbm, m.get_embeddings())
    assert f1 > 0.7, f1


def test_node2vec_end_to_end(small_sbm):
    m = Node2Vec(small_sbm.graph, walk_length=10, num_walks=20, p=0.25,
                 q=4)
    m.train(embed_size=32, window_size=5, iter=3, block_walks=64,
            k_shared=16)
    f1 = microf1(small_sbm, m.get_embeddings())
    assert f1 > 0.7, f1


def test_node2vec_rejection_end_to_end(small_sbm):
    m = Node2Vec(small_sbm.graph, walk_length=10, num_walks=10, p=0.5,
                 q=2, use_rejection_sampling=True)
    m.train(embed_size=32, window_size=5, iter=2, block_walks=64,
            k_shared=16)
    assert np.isfinite(next(iter(m.get_embeddings().values()))).all()


def test_line_end_to_end(small_sbm):
    m = LINE(small_sbm.graph, embedding_size=32, order="second")
    m.train(batch_size=256, epochs=60)
    f1 = microf1(small_sbm, m.get_embeddings())
    assert f1 > 0.6, f1


def test_line_shared_negatives(small_sbm):
    """Optional grouped-shared-negative path trains to similar quality."""
    m = LINE(small_sbm.graph, embedding_size=32, order="second",
             k_shared=16)
    m.train(batch_size=256, epochs=60)
    f1 = microf1(small_sbm, m.get_embeddings())
    assert f1 > 0.6, f1


def test_line_orders(small_sbm):
    m = LINE(small_sbm.graph, embedding_size=16, order="all")
    m.train(batch_size=128, epochs=10)
    emb = m.get_embeddings()
    assert next(iter(emb.values())).shape == (32,)  # concat first+second


def test_sdne_end_to_end(small_sbm):
    m = SDNE(small_sbm.graph, hidden_size=[64, 32])
    m.train(batch_size=1024, epochs=120)  # full-batch (batch >= V)
    f1 = microf1(small_sbm, m.get_embeddings())
    assert f1 > 0.5, f1


def test_sdne_minibatch_mode(small_sbm):
    m = SDNE(small_sbm.graph, hidden_size=[32, 16])
    m.train(batch_size=48, epochs=10)
    assert np.isfinite(np.asarray(m.losses)).all()
    emb = m.get_embeddings()
    assert next(iter(emb.values())).shape == (16,)


def test_struc2vec_end_to_end(tmp_path):
    ds = synthetic_flight(num_nodes=60, seed=5)
    m = Struc2Vec(ds.graph, walk_length=10, num_walks=20,
                  temp_path=str(tmp_path), seed=0)
    m.train(embed_size=16, window_size=3, iter=3, block_walks=32,
            k_shared=8)
    f1 = microf1(ds, m.get_embeddings())
    # structural-role labels: struc2vec should beat the 4-class prior
    assert f1 > 0.4, f1


def test_struc2vec_cache_reuse(tmp_path):
    ds = synthetic_flight(num_nodes=40, seed=6)
    m1 = Struc2Vec(ds.graph, walk_length=5, num_walks=4,
                   temp_path=str(tmp_path), seed=0)
    import os
    cached = [f for f in os.listdir(tmp_path) if f.startswith("context_")]
    assert len(cached) == 1
    m2 = Struc2Vec(ds.graph, walk_length=5, num_walks=4,
                   temp_path=str(tmp_path), reuse=True, seed=0)
    np.testing.assert_array_equal(np.asarray(m1.walks[:, 0]),
                                  np.asarray(m2.walks[:, 0]))


def test_reference_api_from_networkx():
    nx = pytest.importorskip("networkx")
    G = nx.karate_club_graph()
    G = nx.relabel_nodes(G, {n: str(n) for n in G.nodes()})
    m = DeepWalk(G, walk_length=8, num_walks=10)
    m.train(embed_size=16, window_size=3, iter=2, block_walks=32,
            k_shared=8)
    emb = m.get_embeddings()
    assert set(emb) == set(G.nodes())
    assert emb["0"].shape == (16,)


def test_deepwalk_hard_sbm_gate():
    """VERDICT r2 item 9: near-threshold SBM gate. The easy community
    gates saturate at ~1.0 (regressions can hide under them); this
    one sits in a discriminative band — calibrated 3-seed DeepWalk
    micro-F1 at p_in=0.45: [0.725, 0.667, 0.650] (2026-08-20). Gate:
    every seed >= 0.55, mean >= 0.60 — a quality regression of a few
    points fails it, unlike the saturated gates."""
    from graphembedding_tpu.data.datasets import synthetic_wiki_hard
    from graphembedding_tpu.eval.classify import Classifier
    from graphembedding_tpu.models import DeepWalk

    scores = []
    for seed in (0, 1):
        ds = synthetic_wiki_hard()
        m = DeepWalk(ds.graph, walk_length=10, num_walks=20, seed=seed)
        m.train(embed_size=64, window_size=5, iter=3)
        r = Classifier(m.get_embeddings()).split_train_evaluate(
            ds.X, ds.Y, 0.8, seed=0
        )
        scores.append(r["micro"])
    assert min(scores) >= 0.55, scores
    assert sum(scores) / len(scores) >= 0.60, scores


# --------------------------------------------------------------------------- #
# Hard-band quality gates (VERDICT r4 next-5). Calibration:
# benchmarks/gate_calibration.py -> benchmarks/gate_calibration_r05.json
# (2026-08-21, CPU backend, 3 seeds + one planted lr regression each):
#   deepwalk  [0.725, 0.667, 0.650]  planted(alpha x10)  0.000 (NaN)
#   node2vec  [0.725, 0.633, 0.633]  planted(alpha x10)  0.000 (NaN)
#   line      [0.642, 0.650, 0.617]  planted(lr x10)     0.000 (NaN)
#   sdne      [0.508, 0.500, 0.525]  planted(lr -> 0.5)  0.142
#   struc2vec [0.650, 0.625, 0.675]  planted(alpha x100) 0.000 (NaN)
# Each gate sits ~0.1 under its healthy floor: a few-point quality
# regression fails it; the planted regressions fail it catastrophically.
# The saturated p_in=0.85 smoke tests above stay as fast shape checks.
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def hard_sbm():
    from graphembedding_tpu.data.datasets import synthetic_wiki_hard
    return synthetic_wiki_hard()


def test_node2vec_hard_sbm_gate(hard_sbm):
    from graphembedding_tpu.models import Node2Vec
    scores = []
    for seed in (0, 1):
        m = Node2Vec(hard_sbm.graph, walk_length=10, num_walks=20,
                     p=0.25, q=4, seed=seed)
        m.train(embed_size=64, window_size=5, iter=3)
        scores.append(microf1(hard_sbm, m.get_embeddings()))
    assert min(scores) >= 0.53, scores
    assert sum(scores) / len(scores) >= 0.58, scores


def test_line_hard_sbm_gate(hard_sbm):
    from graphembedding_tpu.models import LINE
    scores = []
    for seed in (0, 1):
        m = LINE(hard_sbm.graph, embedding_size=64, order="second",
                 seed=seed)
        m.train(batch_size=1024, epochs=80)
        scores.append(microf1(hard_sbm, m.get_embeddings()))
    assert min(scores) >= 0.52, scores
    assert sum(scores) / len(scores) >= 0.56, scores


def test_sdne_hard_sbm_gate(hard_sbm):
    from graphembedding_tpu.models import SDNE
    scores = []
    for seed in (0, 1):
        m = SDNE(hard_sbm.graph, hidden_size=[128, 64], seed=seed)
        m.train(batch_size=1024, epochs=150)
        scores.append(microf1(hard_sbm, m.get_embeddings()))
    assert min(scores) >= 0.40, scores
    assert sum(scores) / len(scores) >= 0.45, scores


def test_struc2vec_hard_flight_gate(tmp_path):
    from graphembedding_tpu.data.datasets import synthetic_flight_hard
    from graphembedding_tpu.models import Struc2Vec
    ds = synthetic_flight_hard()
    scores = []
    for seed in (0, 1):
        m = Struc2Vec(ds.graph, walk_length=10, num_walks=20,
                      temp_path=str(tmp_path / f"s{seed}"), seed=seed)
        m.train(embed_size=32, window_size=3, iter=3)
        scores.append(microf1(ds, m.get_embeddings()))
    assert min(scores) >= 0.52, scores
    assert sum(scores) / len(scores) >= 0.56, scores
