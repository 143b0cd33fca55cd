"""`ge.classify` shim -> graphembedding_tpu.eval.classify."""

from graphembedding_tpu.eval.classify import (  # noqa: F401
    Classifier,
    TopKRanker,
    read_node_label,
)
