"""`ge.alias` shim -> graphembedding_tpu.ops.alias."""

from graphembedding_tpu.ops.alias import (  # noqa: F401
    alias_sample,
    create_alias_table,
)
