"""Calibrate discriminative quality bands for the model gates.

VERDICT r4 next-5: four of five families gated on an easy p_in=0.85 SBM
at f1 > 0.7 (near-saturated) — regressions can hide. This script runs
each family on its HARD synthetic (near-threshold SBM for community
models; degree-octile flight for struc2vec) over seeds, plus a PLANTED
REGRESSION run (learning rate x10) per family, so the committed gates
in tests/test_models.py demonstrably separate healthy from broken.

Run (CPU, same backend as the test suite):
  JAX_PLATFORMS=cpu python -m benchmarks.gate_calibration
"""

from __future__ import annotations

import json
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401

    from graphembedding_tpu.data.datasets import (
        synthetic_flight_hard, synthetic_wiki_hard)
    from graphembedding_tpu.eval.classify import Classifier
    from graphembedding_tpu.models import (
        LINE, SDNE, DeepWalk, Node2Vec, Struc2Vec)

    def f1(ds, emb):
        return Classifier(emb).split_train_evaluate(
            ds.X, ds.Y, 0.8, seed=0)["micro"]

    hard = synthetic_wiki_hard()
    flight = synthetic_flight_hard()
    out = {}

    def run(name, fn, seeds=(0, 1, 2)):
        def safe(*a):
            # a diverged (NaN) embedding crashes the classifier — that
            # IS a failed gate; score it 0
            try:
                v = fn(*a)
                return round(v, 4) if v == v else 0.0
            except Exception:
                return 0.0

        scores = [safe(s, False) for s in seeds]
        broken = safe(seeds[0], True)  # lr-plant per family (x10-x100)
        out[name] = {"scores": scores, "planted": broken}
        print(json.dumps({name: out[name]}), flush=True)

    def deepwalk(seed, broken):
        m = DeepWalk(hard.graph, walk_length=10, num_walks=20, seed=seed)
        m.train(embed_size=64, window_size=5, iter=3,
                alpha=0.25 if broken else 0.025)
        return f1(hard, m.get_embeddings())

    def node2vec(seed, broken):
        m = Node2Vec(hard.graph, walk_length=10, num_walks=20,
                     p=0.25, q=4, seed=seed)
        m.train(embed_size=64, window_size=5, iter=3,
                alpha=0.25 if broken else 0.025)
        return f1(hard, m.get_embeddings())

    def line(seed, broken):
        m = LINE(hard.graph, embedding_size=64, order="second", seed=seed)
        m.train(batch_size=1024, epochs=80,
                initial_lr=0.25 if broken else 0.025)
        return f1(hard, m.get_embeddings())

    def sdne(seed, broken):
        m = SDNE(hard.graph, hidden_size=[128, 64], seed=seed)
        m.train(batch_size=1024, epochs=150,
                learning_rate=0.5 if broken else 1e-3)
        return f1(hard, m.get_embeddings())

    def struc2vec(seed, broken):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            m = Struc2Vec(flight.graph, walk_length=10, num_walks=20,
                          temp_path=td, seed=seed)
            m.train(embed_size=32, window_size=3, iter=3,
                    alpha=2.5 if broken else 0.025)
            return f1(flight, m.get_embeddings())

    run("deepwalk", deepwalk)
    run("node2vec", node2vec)
    run("line", line)
    run("sdne", sdne)
    run("struc2vec", struc2vec)
    with open("benchmarks/gate_calibration_r05.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
