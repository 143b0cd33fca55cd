from graphembedding_tpu.parallel.mesh import make_mesh
from graphembedding_tpu.parallel.trainer import DistributedSkipGramTrainer

__all__ = ["make_mesh", "DistributedSkipGramTrainer"]
