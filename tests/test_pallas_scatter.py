"""Interpret-mode correctness tests for ops/pallas_scatter.

These kernels are the round-5 experiment that CLOSED the Pallas
scatter question (utils/profiling.py: measured negative —
XLA's native row path wins at every table size on this device). They
stay in-tree as tested oracles; these tests pin their semantics
against the XLA primitives they were raced against.
"""

import numpy as np
import pytest

from graphembedding_tpu.ops.pallas_scatter import (
    gather_rows_matmul,
    scatter_add_matmul,
    scatter_add_rows,
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    v, c, n = 704, 256, 3000
    table = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=n).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    return table, ids, grads


def test_rmw_scatter_exact(case):
    table, ids, grads = case
    ref = table.at[ids].add(grads)
    out = scatter_add_rows(table, ids, grads, block=512, window=4,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_rmw_scatter_unaligned_v_and_odd_n(case):
    table, ids, grads = case
    table = table[:700]  # v % 8 != 0 -> padded path
    ids = jnp.minimum(ids[:2500], 699)
    grads = grads[:2500]
    ref = table.at[ids].add(grads)
    out = scatter_add_rows(table, ids, grads, block=512, window=8,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_rmw_scatter_duplicate_heavy(case):
    # all ids in a tiny range: maximal run lengths + window collisions
    table, _, grads = case
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 9, 3000).astype(np.int32))
    ref = table.at[ids].add(grads)
    out = scatter_add_rows(table, ids, grads, block=512, window=4,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("split,atol", [(1, 0.1), (2, 5e-4)])
def test_matmul_gather(case, split, atol):
    table, ids, _ = case
    out = gather_rows_matmul(table, ids, block=512, split=split,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table[ids]), atol=atol)


@pytest.mark.parametrize("split,atol", [(1, 0.5), (2, 5e-3)])
def test_matmul_scatter(case, split, atol):
    table, ids, grads = case
    ref = table.at[ids].add(grads)
    out = scatter_add_matmul(table, ids, grads, block=512, split=split,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=atol)
