"""Pallas fused SGNS block-compute kernel.

BASELINE.json's north-star kernel: "skip-gram with negative sampling as
fused embedding-gather -> dot -> sigmoid -> scatter-add Pallas kernels".
Division of labor on TPU hardware:

- The *gather/scatter* halves stay in XLA: v5e has a hardware-assisted
  row gather/scatter path that per-row DMA from a Pallas kernel cannot
  beat (measured ~10 ns/row through XLA vs ~µs-scale per-row DMA issue
  overhead).
- The *compute* half — window logits, sigmoids, masks, negative
  scoring, all six gradient matmuls — is this kernel: one VMEM-resident
  fused program per packed walk group, six 128-tile MXU matmuls with no
  HBM round-trips for the [PL, PL] / [PL, K] intermediates.

Layout matches `train.skipgram.sgns_block_chunk`'s packed formulation:
P = 128//L walks per group, PL = P·L positions, K shared negatives per
group. Negative sharing (`neg_share_packs` = r > 1) is supported: vn is
[G2, K, D] with r = G // G2 consecutive packing groups sharing one
negative set. The grid stays over the G packing groups; the shared
`d_vn` block is ACCUMULATED across the r consecutive grid steps that
revisit it (TPU Pallas keeps an output block resident in VMEM while
consecutive grid indices map to the same block, so the accumulation
never round-trips HBM).

Inputs are the already-gathered rows; outputs are the gradient blocks
the caller scatter-adds. `sgns_block_grads_xla` is the identical-math
pure-XLA einsum path (the default, and the correctness oracle in tests
via `interpret=True`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(yin_ref, yout_ref, vn_ref, mask_ref, negok_ref, out_din,
            out_dout, out_dvn, out_loss, *, neg_w, r):
    yin = yin_ref[0]  # [PL, D]
    yout = yout_ref[0]
    vn = vn_ref[0]  # [K, D] (shared by r consecutive groups)
    mask = mask_ref[0]  # [PL, PL] f32
    neg_ok = negok_ref[0]  # [PL, K] f32 — this group's slice

    logits = jax.lax.dot_general(
        yin, yout, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [PL, PL]
    g_pos = (jax.nn.sigmoid(logits) - 1.0) * mask

    nlog = jax.lax.dot_general(
        yin, vn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [PL, K]
    n_pairs = jnp.sum(mask, axis=1, keepdims=True)  # [PL, 1]
    g_neg = jax.nn.sigmoid(nlog) * (n_pairs * neg_w) * neg_ok  # [PL, K]

    d_yin = jax.lax.dot_general(
        g_pos, yout, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        g_neg, vn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [PL, D]
    d_yout = jax.lax.dot_general(
        g_pos, yin, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [PL, D]  (sum over centers l of g_pos[l, m] yin[l])
    d_vn = jax.lax.dot_general(
        g_neg, yin, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, D]

    out_din[0] = d_yin
    out_dout[0] = d_yout
    if r == 1:
        out_dvn[0] = d_vn
    else:
        # r consecutive grid steps revisit the same [K, D] output
        # block: zero it on the group's first visit, accumulate after
        g = pl.program_id(0)

        @pl.when(g % r == 0)
        def _init():
            out_dvn[0] = d_vn

        @pl.when(g % r != 0)
        def _acc():
            out_dvn[0] += d_vn

    loss = -(
        jnp.sum(jax.lax.select(
            mask > 0,
            jax.nn.log_sigmoid(logits),
            jnp.zeros_like(logits),
        ) * mask)
        + jnp.sum(jax.nn.log_sigmoid(-nlog) * (n_pairs * neg_w) * neg_ok)
    )
    # loss lives in a (8, 128) tile (TPU block-shape minimum); slot
    # [0,0] via an iota mask (dynamic scatter isn't lowerable in Mosaic)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_loss[0] = jnp.where((rows == 0) & (cols == 0), loss, 0.0)


def sgns_block_grads_pallas(yin, yout, vn, mask, neg_ok, neg_w,
                            *, interpret=False):
    """Fused gradient blocks for packed SGNS groups.

    Shapes: yin/yout [G, PL, D], mask [G, PL, PL] f32; vn [G2, K, D]
    and neg_ok [G2, (G//G2)*PL, K] f32 where G2 divides G — when
    G2 < G, r = G // G2 consecutive packing groups share one negative
    set (train.skipgram `neg_share_packs`). Returns (d_yin, d_yout,
    d_vn [G2, K, D], loss_sum [G]).

    Note on the per-group loss split when r > 1: each group's loss
    entry carries ITS OWN slice of the shared-negative loss, while the
    XLA oracle spreads the sharing group's negative loss evenly over
    its r members — the [G]-sums over any sharing group (and the total)
    are identical, the per-entry split differs. Callers reduce the sum.
    """
    G, PL, D = yin.shape
    G2, K, _ = vn.shape
    if G % G2:
        raise ValueError(f"G ({G}) must be a multiple of G2 ({G2})")
    r = G // G2

    grid = (G,)
    spec3 = lambda a, b: pl.BlockSpec(  # noqa: E731
        (1, a, b), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    vn_spec = pl.BlockSpec(
        (1, K, D), lambda g: (g // r, 0, 0), memory_space=pltpu.VMEM
    )
    negok_spec = pl.BlockSpec(
        (1, PL, K), lambda g: (g // r, g % r, 0),
        memory_space=pltpu.VMEM,
    )
    d_yin, d_yout, d_vn, loss = pl.pallas_call(
        partial(_kernel, neg_w=float(neg_w), r=r),
        grid=grid,
        in_specs=[
            spec3(PL, D),
            spec3(PL, D),
            vn_spec,
            spec3(PL, PL),
            negok_spec,
        ],
        out_specs=[
            spec3(PL, D),
            spec3(PL, D),
            vn_spec,
            spec3(8, 128),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, PL, D), jnp.float32),
            jax.ShapeDtypeStruct((G, PL, D), jnp.float32),
            jax.ShapeDtypeStruct((G2, K, D), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(yin, yout, vn, mask, neg_ok)
    return d_yin, d_yout, d_vn, loss[:, 0, 0]


def sgns_block_grads_xla(yin, yout, vn, mask, neg_ok, neg_w,
                         bf16=False):
    """Reference XLA einsum path (identical math).

    Shapes: yin/yout [G, PL, D], mask [G, PL, PL]; vn [G2, K, D] and
    neg_ok [G2, (G//G2)*PL, K] where G2 divides G — when G2 < G,
    consecutive packing groups share one negative set (see
    train.skipgram `neg_share_packs`). Returns d_vn as [G2, K, D].

    bf16=True runs the six einsums with bfloat16 operands and f32
    accumulation (the MXU's native mode — 2x the f32 matmul rate);
    logits land in f32, so only the ~3-decimal-digit rounding of the
    embedding rows themselves differs. The tables, gradients, and SGD
    update stay f32.
    """
    cd = jnp.bfloat16 if bf16 else jnp.float32
    G, PL, D = yin.shape
    G2 = vn.shape[0]  # negative-sharing groups; r = G // G2 packing
    # groups share each K-row negative set (halved/quartered negative
    # row issues — the dominant kernel cost — at the price of r x the
    # per-negative-row event weight, which the update cap bounds)
    r = G // G2
    yin_c, yout_c, vn_c = yin.astype(cd), yout.astype(cd), vn.astype(cd)
    logits = jnp.einsum("gld,gmd->glm", yin_c, yout_c,
                        preferred_element_type=jnp.float32)
    g_pos = (jax.nn.sigmoid(logits) - 1.0) * mask
    yin_n = yin_c.reshape(G2, r * PL, D)
    nlog = jnp.einsum("gld,gkd->glk", yin_n, vn_c,
                      preferred_element_type=jnp.float32)
    n_pairs = jnp.sum(mask, axis=2)
    np_n = n_pairs.reshape(G2, r * PL)
    g_neg = jax.nn.sigmoid(nlog) * (np_n * neg_w)[:, :, None] * neg_ok
    d_yin = jnp.einsum("glm,gmd->gld", g_pos.astype(cd), yout_c,
                       preferred_element_type=jnp.float32)
    d_yin = d_yin + jnp.einsum("glk,gkd->gld", g_neg.astype(cd), vn_c,
                               preferred_element_type=jnp.float32
                               ).reshape(G, PL, D)
    d_yout = jnp.einsum("glm,gld->gmd", g_pos.astype(cd), yin_c,
                        preferred_element_type=jnp.float32)
    d_vn = jnp.einsum("glk,gld->gkd", g_neg.astype(cd), yin_n,
                      preferred_element_type=jnp.float32)
    loss = -(
        jnp.sum(jnp.where(mask > 0, jax.nn.log_sigmoid(logits), 0.0)
                * mask, axis=(1, 2))
        + jnp.sum(jax.nn.log_sigmoid(-nlog)
                  * (np_n * neg_w)[:, :, None] * neg_ok,
                  axis=(1, 2)).reshape(G2).repeat(r) / r
    )
    return d_yin, d_yout, d_vn, loss
