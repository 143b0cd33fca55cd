"""Sharded SDNE training: exact data parallelism over adjacency rows.

New surface area vs the reference (single-host TF1, SURVEY.md §3.3).
Unlike the embedding-table trainers there is no hogwild trade here —
the MLP parameters are replicated and gradients are `psum`'d every
step, so the sharded run computes the *same* full-batch objective and
updates as the single-device `SDNE.train` (batch_size >= V mode):

- rows of A (and the matching rows of L) are sharded over the `data`
  axis — each device encodes/decodes its row block ([V/n, V] x W1 is
  the dominant MXU matmul, now 1/n per chip;
- the Laplacian term tr(YᵀLY) = Σ_i ⟨y_i, (LY)_i⟩ needs every row's
  embedding: the [V, d] Y is assembled with `all_gather` over `data`
  (d <= 128, KBs-MBs — cheap on ICI) and each device contracts its
  local L rows; the all_gather's transpose (psum_scatter) routes the
  cross-device cotangents back, so autodiff through it yields the
  exact global gradient;
- the weight-regularization term is divided by the data-axis size so
  the gradient psum counts it once.

Rows are zero-padded to a multiple of the axis size; a row-validity
mask keeps padded rows out of the losses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def sharded_sdne_train(
    mesh,
    tx,
    *,
    num_nodes,
    alpha,
    beta,
    nu1,
    nu2,
    n_epochs,
):
    """Build the jitted sharded full-batch epoch runner.

    Returns fn(params, opt_state, A_pad, L_pad, ok) ->
    (params, opt_state, losses[n_epochs]) with A_pad [Vp, V] and
    L_pad [Vp, Vp] row-sharded over 'data', ok [Vp] the row mask.
    """
    import optax

    from graphembedding_tpu.models.sdne import decode, encode

    n_data = mesh.shape["data"]
    if mesh.shape.get("model", 1) != 1:
        raise ValueError(
            "SDNE shards over the data axis only; use a (n, 1) mesh"
        )
    V = num_nodes
    a, b = jnp.float32(alpha), jnp.float32(beta)
    r1, r2 = jnp.float32(nu1), jnp.float32(nu2)

    def body(params, opt_state, a_rows, l_rows, ok):
        # a_rows: [Vp/n, V]; l_rows: [Vp/n, Vp]; ok: [Vp/n]

        def loss_local(params):
            y = encode(params, a_rows)  # [Vl, d]
            a_hat = decode(params, y)
            b_ = jnp.where(a_rows != 0, b, 1.0)
            l2nd = jnp.sum(
                jnp.sum(jnp.square((a_rows - a_hat) * b_), axis=-1)
                * ok
            ) / V
            y_full = jax.lax.all_gather(y, "data", tiled=True)  # [Vp,d]
            l1st = a * 2.0 * jnp.sum(y * (l_rows @ y_full)) / V
            reg = 0.0
            for stack in (params["enc"], params["dec"]):
                for layer in stack:
                    reg = reg + r1 * jnp.sum(jnp.abs(layer["w"])) + (
                        r2 * jnp.sum(jnp.square(layer["w"]))
                    )
            # replicated term: counted once after the gradient psum
            return l2nd + l1st + reg / n_data

        grad_fn = jax.value_and_grad(loss_local)

        def step(carry, _):
            params, opt_state = carry
            loss_l, grads = grad_fn(params)
            grads = jax.lax.psum(grads, "data")
            loss = jax.lax.psum(loss_l, "data")
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=n_epochs
        )
        return params, opt_state, losses

    rep = P()
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, rep, P("data", None), P("data", None),
                  P("data")),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))


def pad_rows(A, L, num_nodes, n_data):
    """Zero-pad A [V, V] -> [Vp, V], L -> [Vp, Vp], mask [Vp]."""
    V = num_nodes
    Vp = ((V + n_data - 1) // n_data) * n_data
    pad = Vp - V
    A_pad = jnp.pad(A, ((0, pad), (0, 0)))
    L_pad = jnp.pad(L, ((0, pad), (0, pad)))
    ok = jnp.pad(jnp.ones((V,), jnp.float32), (0, pad))
    return A_pad, L_pad, ok
