"""Downstream node-classification oracle (micro/macro-F1).

Reference counterpart: `ge/classify.py — TopKRanker / Classifier /
read_node_label [U]`. This is the framework's correctness metric
(BASELINE.json: "Wiki node-classification micro-F1 vs reference"), so the
semantics are reproduced exactly:

- one-vs-rest logistic regression over the embedding vectors;
- **top-k prediction rule**: for each test node, take its k highest
  class probabilities as the predicted label set, where k = the node's
  true label count (the standard multi-label eval trick — getting this
  wrong moves micro-F1 by points);
- fixed-seed shuffle split (`numpy.random.seed(seed)` then a single
  permutation), train fraction 0.8 in the canonical configs.

Pure CPU sklearn by design — evaluation is not a device workload.
"""

from __future__ import annotations

import numpy as np
from sklearn.linear_model import LogisticRegression
from sklearn.metrics import accuracy_score, f1_score
from sklearn.multiclass import OneVsRestClassifier
from sklearn.preprocessing import MultiLabelBinarizer


class TopKRanker(OneVsRestClassifier):
    """Predict each row's top-k classes, k given per row."""

    def predict(self, X, top_k_list):
        probs = np.asarray(super().predict_proba(X))
        all_labels = []
        for i, k in enumerate(top_k_list):
            probs_ = probs[i, :]
            labels = self.classes_[probs_.argsort()[-k:]].tolist()
            probs_[:] = 0
            probs_[labels] = 1
            all_labels.append(probs_)
        return np.asarray(all_labels)


class Classifier:
    def __init__(self, embeddings, clf=None):
        self.embeddings = embeddings
        self.clf = TopKRanker(clf or LogisticRegression())
        self.binarizer = MultiLabelBinarizer(sparse_output=True)

    def train(self, X, Y, Y_all):
        self.binarizer.fit(Y_all)
        X_train = np.asarray([self.embeddings[x] for x in X])
        Y_bin = self.binarizer.transform(Y)
        self.clf.fit(X_train, Y_bin)

    def evaluate(self, X, Y):
        top_k_list = [len(l) for l in Y]
        Y_pred = self.predict(X, top_k_list)
        Y_true = self.binarizer.transform(Y)
        averages = ["micro", "macro", "samples", "weighted"]
        results = {
            avg: f1_score(Y_true, Y_pred, average=avg, zero_division=0)
            for avg in averages
        }
        results["acc"] = accuracy_score(Y_true, Y_pred)
        return results

    def predict(self, X, top_k_list):
        X_ = np.asarray([self.embeddings[x] for x in X])
        return self.clf.predict(X_, top_k_list)

    def split_train_evaluate(self, X, Y, train_precent, seed=0):
        """Reference-exact seeded shuffle split (incl. the arg typo)."""
        state = np.random.get_state()
        training_size = int(train_precent * len(X))
        np.random.seed(seed)
        shuffle_indices = np.random.permutation(np.arange(len(X)))
        X_train = [X[shuffle_indices[i]] for i in range(training_size)]
        Y_train = [Y[shuffle_indices[i]] for i in range(training_size)]
        X_test = [X[shuffle_indices[i]] for i in range(training_size, len(X))]
        Y_test = [Y[shuffle_indices[i]] for i in range(training_size, len(X))]
        self.train(X_train, Y_train, Y)
        np.random.set_state(state)
        return self.evaluate(X_test, Y_test)


def read_node_label(filename, skip_head=False):
    """Read `node label [label...]` lines -> (X nodes, Y label-lists)."""
    X, Y = [], []
    with open(filename) as fin:
        if skip_head:
            fin.readline()
        for line in fin:
            vec = line.strip().split()
            if not vec:
                continue
            X.append(vec[0])
            Y.append(vec[1:])
    return X, Y
