"""`ge.utils` shim -> graphembedding_tpu.utils.vocab."""

from graphembedding_tpu.utils.vocab import (  # noqa: F401
    partition_dict,
    partition_list,
    partition_num,
    preprocess_nxgraph,
)
