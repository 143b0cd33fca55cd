from graphembedding_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    put_global,
)
from graphembedding_tpu.parallel.trainer import DistributedSkipGramTrainer
from graphembedding_tpu.parallel.walks import DistributedWalker

__all__ = [
    "make_mesh",
    "init_distributed",
    "put_global",
    "DistributedSkipGramTrainer",
    "DistributedWalker",
]
