from graphembedding_tpu.utils.vocab import Vocab, preprocess_nxgraph

__all__ = ["Vocab", "preprocess_nxgraph"]
