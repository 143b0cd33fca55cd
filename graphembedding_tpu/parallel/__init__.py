from graphembedding_tpu.parallel.mesh import init_distributed, make_mesh
from graphembedding_tpu.parallel.trainer import DistributedSkipGramTrainer

__all__ = [
    "make_mesh",
    "init_distributed",
    "DistributedSkipGramTrainer",
]
