"""Pallas fused SGNS kernel vs the XLA einsum oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphembedding_tpu.ops.pallas_sgns import (
    sgns_block_grads_pallas,
    sgns_block_grads_xla,
)


def make_inputs(G=3, PL=24, D=16, K=8, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    yin = jax.random.normal(ks[0], (G, PL, D)) * 0.3
    yout = jax.random.normal(ks[1], (G, PL, D)) * 0.3
    vn = jax.random.normal(ks[2], (G, K, D)) * 0.3
    mask = (jax.random.uniform(ks[3], (G, PL, PL)) < 0.2).astype(
        jnp.float32
    )
    neg_ok = (jax.random.uniform(ks[4], (G, PL, K)) < 0.9).astype(
        jnp.float32
    )
    return yin, yout, vn, mask, neg_ok


def test_pallas_kernel_matches_xla_oracle():
    inputs = make_inputs()
    neg_w = 5.0 / 8
    want = sgns_block_grads_xla(*inputs, neg_w)
    got = sgns_block_grads_pallas(*inputs, neg_w, interpret=True)
    for g, w, name in zip(got, want,
                          ["d_yin", "d_yout", "d_vn", "loss"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-5,
            err_msg=name,
        )


def test_pallas_kernel_zero_mask_zero_grads():
    yin, yout, vn, mask, neg_ok = make_inputs(seed=1)
    mask = jnp.zeros_like(mask)
    neg_w = 1.0
    d_yin, d_yout, d_vn, loss = sgns_block_grads_pallas(
        yin, yout, vn, mask, neg_ok, neg_w, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d_yin), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_yout), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_vn), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(loss), 0, atol=1e-5)
