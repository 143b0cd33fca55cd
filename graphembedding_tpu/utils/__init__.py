from graphembedding_tpu.utils.vocab import (
    Vocab,
    partition_dict,
    partition_list,
    partition_num,
    preprocess_nxgraph,
)

__all__ = [
    "Vocab",
    "preprocess_nxgraph",
    "partition_dict",
    "partition_list",
    "partition_num",
]
