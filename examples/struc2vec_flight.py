"""Struc2Vec on the Brazil flight network — reference
`examples/struc2vec_flight.py [U]` parity.

Canonical hyperparameters: Struc2Vec(10, 80, workers=4, verbose=40),
train default; brazil-airports edgelist, 4 activity-quartile classes.
"""

from common import mesh_from_args, run

from graphembedding_tpu.models import Struc2Vec


def build_and_train(ds, args):
    model = Struc2Vec(ds.graph, walk_length=10, num_walks=80,
                      workers=4, verbose=40, seed=args.seed)
    model.train(embed_size=args.embed_size, window_size=5, iter=5,
                mesh=mesh_from_args(args))
    return model


if __name__ == "__main__":
    run("Struc2Vec", "flight-brazil", build_and_train)
