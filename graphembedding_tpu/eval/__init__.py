from graphembedding_tpu.eval.classify import Classifier, read_node_label

__all__ = ["Classifier", "read_node_label"]
