from graphembedding_tpu.models.deepwalk import DeepWalk
from graphembedding_tpu.models.line import LINE
from graphembedding_tpu.models.node2vec import Node2Vec
from graphembedding_tpu.models.sdne import SDNE
from graphembedding_tpu.models.struc2vec import Struc2Vec

__all__ = ["DeepWalk", "Node2Vec", "LINE", "SDNE", "Struc2Vec"]
