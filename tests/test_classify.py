import numpy as np

from graphembedding_tpu.eval.classify import Classifier, read_node_label


def test_topk_rule_and_split(tmp_path):
    # build a separable toy problem: 3 classes in embedding space
    rng = np.random.default_rng(0)
    n_per = 40
    emb = {}
    X, Y = [], []
    centers = np.eye(3) * 5
    for c in range(3):
        for i in range(n_per):
            name = f"n{c}_{i}"
            emb[name] = centers[c] + rng.standard_normal(3) * 0.3
            X.append(name)
            Y.append([str(c)])
    clf = Classifier(emb)
    res = clf.split_train_evaluate(X, Y, 0.8, seed=0)
    assert res["micro"] > 0.95
    assert set(res) == {"micro", "macro", "samples", "weighted", "acc"}


def test_split_is_seeded_and_restores_rng_state():
    rng_before = np.random.random()
    emb = {f"x{i}": np.array([float(i), 1.0]) for i in range(20)}
    X = [f"x{i}" for i in range(20)]
    Y = [[str(i % 2)] for i in range(20)]
    clf = Classifier(emb)
    r1 = clf.split_train_evaluate(X, Y, 0.5, seed=7)
    clf2 = Classifier(emb)
    r2 = clf2.split_train_evaluate(X, Y, 0.5, seed=7)
    assert r1 == r2


def test_multilabel_topk():
    # node with 2 true labels gets exactly its top-2 predicted
    rng = np.random.default_rng(1)
    emb, X, Y = {}, [], []
    for i in range(60):
        which = i % 3
        v = np.zeros(3)
        v[which] = 3
        v[(which + 1) % 3] = 2.5
        emb[f"m{i}"] = v + rng.standard_normal(3) * 0.1
        X.append(f"m{i}")
        Y.append([str(which), str((which + 1) % 3)])
    clf = Classifier(emb)
    res = clf.split_train_evaluate(X, Y, 0.7, seed=0)
    assert res["micro"] > 0.8


def test_read_node_label(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("a 1 2\nb 0\n\nc 2\n")
    X, Y = read_node_label(str(p))
    assert X == ["a", "b", "c"]
    assert Y == [["1", "2"], ["0"], ["2"]]
