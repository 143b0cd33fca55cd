"""`ge.walker` shim -> graphembedding_tpu.walker."""

from graphembedding_tpu.walker import (  # noqa: F401
    BiasedWalker,
    RandomWalker,
)
