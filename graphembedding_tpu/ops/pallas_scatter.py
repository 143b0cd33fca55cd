"""Pallas row gather / scatter-add kernels that bypass XLA's scatter path.

Round-4 measurements (benchmarks/rowcost_vs_V_r04.jsonl,
scatter_regime_probes_r04.jsonl) established that XLA's scatter-add on
this device is *table-row-count* keyed: ~37 ns/row at a 125k-row table
vs ~98 ns/row above ~350k-375k rows, dtype-invariant, and immune to
every XLA-space workaround (chunked / folded / sorted all measured
worse). Gather stays flat ~14 ns/row at any V. The cliff is therefore
an artifact of XLA's scatter lowering, not of the memory system — which
makes hand-scheduled Pallas kernels the one untried lever (VERDICT r4
next-1). Two designs, for the two regimes:

1. ``scatter_add_rows`` (any V, the >350k-row cliff dodge):
   XLA-side ``argsort`` brings duplicate ids adjacent; the kernel walks
   sorted positions, accumulates each duplicate run into a VMEM slot,
   and performs ONE read-modify-write row DMA per *unique* row against
   the HBM-resident table, software-pipelined over a ring of W slots
   (read DMAs issued at run starts, writes at run ends, slot reuse
   gated on write completion). Never touches XLA's scatter lowering,
   so the per-row cost is the hand pipeline's issue overhead — flat
   in V by construction.

2. ``gather_rows_matmul`` / ``scatter_add_matmul`` (small V):
   gather/scatter as one-hot matmuls on the MXU. The one-hot tiles are
   built in VMEM (never materialized to HBM) and the [V, C] table /
   accumulator is VMEM-resident, so the whole operation is
   table-stream + MXU MACs — no per-row issue cost at all. At wiki
   scale (V=2405, C=256, N=45696) the XLA row path costs
   ~0.55 ms gather + ~0.86 ms scatter (the round-4 roofline's binding
   phases); the matmul form is N*V*C MACs ≈ 28 GFLOP ≈ 0.15-0.3 ms on
   the MXU. Only viable while V_pad*C*4 fits VMEM (~10 MB) and the
   MAC count stays small — the caller gates on V.

Reference counterpart: gensim ``word2vec_inner.pyx`` [U]'s role — the
hot update loop of the reference's training stack (SURVEY §3.2);
BASELINE.json's "fused embedding-gather -> dot -> sigmoid ->
scatter-add Pallas kernels" north star.

Precision: the matmul kernels offer ``split=1`` (operands rounded to
bf16; exact one-hot, lossy payload) and ``split=2`` (bf16x2 hi+lo
operand splitting; ~f32-accurate at 2x the MACs). The RMW kernel is
exact f32 (accumulation order differs from XLA's scatter — bitwise
parity is not guaranteed, only exact-sum-up-to-fp-reassociation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENT = jnp.iinfo(jnp.int32).max  # sorted-tail padding id; never a row


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# 1. Sorted run-accumulating RMW scatter (any V)
# ---------------------------------------------------------------------------


def _rmw_kernel(sids_ref, grads_ref, _tbl_in, tbl_ref,
                *scratch, block, window, last_g):
    """One grid step: walk `block` sorted positions.

    Mosaic DMA requires 8-sublane-aligned slices on BOTH the VMEM and
    (tiled) HBM side, so the RMW unit is an aligned 8-row table
    window, not a single row: a "run" is the maximal stretch of
    sorted positions whose id >> 3 matches. Each run accumulates its
    grad rows into an (8, C) VMEM tile via a sublane mask (VPU
    full-tile ops — no sub-tile stores), then one read + one write
    DMA of the aligned window. Windows of distinct runs are disjoint
    (ids sorted), so pipelined RMWs never race.

    Scratch: `window` acc tiles (8, C), `window` rd tiles (8, C),
    SMEM state, read sems (W,), write sems (W,). Per-slot standalone
    buffers with static-branch ``lax.switch`` dispatch (dynamic
    slicing of a stacked scratch would itself be a sub-tile slice).

    st (SMEM int32[2]): [0] = run index r (-1 before any run),
    [1] = previous position's id (-1 initial; ids are >= 0).
    """
    accs = scratch[:window]
    rds = scratch[window:2 * window]
    st = scratch[2 * window]
    read_sems = scratch[2 * window + 1]
    write_sems = scratch[2 * window + 2]
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        st[0] = -1
        st[1] = -1

    base = g * block
    c = accs[0].shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, c), 0)

    def _window_slice(gid):
        lo = pl.multiple_of(gid * 8, 8)
        return tbl_ref.at[pl.ds(lo, 8), :]

    def _wait_write(k):
        # DMA sems are byte-counted: wait with a same-shaped
        # descriptor (dst window index does not participate)
        pltpu.make_async_copy(
            accs[k], tbl_ref.at[pl.ds(0, 8), :], write_sems.at[k]
        ).wait()

    def body(i, carry):
        r, prev = carry
        p = base + i
        myid = sids_ref[p]
        nxt = sids_ref[p + 1]
        valid = myid != _SENT
        gid = jax.lax.shift_right_logical(myid, 3)
        is_start = jnp.logical_and(
            valid, gid != jax.lax.shift_right_logical(prev, 3))
        is_end = jnp.logical_and(
            valid, gid != jax.lax.shift_right_logical(nxt, 3))
        r_new = jnp.where(is_start, r + 1, r)
        s = jax.lax.rem(r_new, window)
        # this position's grad row, placed at its sublane within the
        # window: full-tile VPU select (no sub-tile stores)
        local = jnp.bitwise_and(myid, 7)
        contrib = jnp.where(
            row_iota == local, grads_ref[pl.ds(i, 1), :], 0.0)

        @pl.when(is_start)
        def _start():
            def br(k):
                def _():
                    # slot reuse: drain the write issued for run
                    # r_new - window before overwriting acc/rd
                    @pl.when(r_new >= window)
                    def _drain():
                        _wait_write(k)

                    pltpu.make_async_copy(
                        _window_slice(gid), rds[k], read_sems.at[k],
                    ).start()
                    accs[k][:] = contrib
                return _
            jax.lax.switch(s, [br(k) for k in range(window)])

        @pl.when(jnp.logical_and(valid, jnp.logical_not(is_start)))
        def _accum():
            def br(k):
                def _():
                    accs[k][:] = accs[k][:] + contrib
                return _
            jax.lax.switch(s, [br(k) for k in range(window)])

        @pl.when(is_end)
        def _flush():
            def br(k):
                def _():
                    pltpu.make_async_copy(
                        _window_slice(gid), rds[k], read_sems.at[k],
                    ).wait()
                    accs[k][:] = accs[k][:] + rds[k][:]
                    pltpu.make_async_copy(
                        accs[k], _window_slice(gid), write_sems.at[k],
                    ).start()
                return _
            jax.lax.switch(s, [br(k) for k in range(window)])

        return r_new, jnp.where(valid, myid, prev)

    r, prev = jax.lax.fori_loop(
        0, block, body, (st[0], st[1]), unroll=False)
    st[0] = r
    st[1] = prev

    @pl.when(g == last_g)
    def _final_drain():
        # every used slot has exactly one un-awaited write (reuse waits
        # consume all earlier ones); used slots = min(r + 1, window)
        n_used = jnp.minimum(r + 1, window)
        for k in range(window):
            @pl.when(k < n_used)
            def _(k=k):
                _wait_write(k)


@partial(jax.jit, static_argnames=("block", "window", "interpret"))
def scatter_add_rows(table, ids, grads, *, block=2048, window=8,
                     interpret=False):
    """table.at[ids].add(grads) via a Pallas RMW pipeline (exact f32).

    Sorts ids (XLA), then one read-modify-write row DMA per unique id,
    duplicate runs pre-accumulated in VMEM. Flat in V — built to dodge
    the measured >350k-row XLA scatter cliff. `table` is donated.
    """
    v, c = table.shape
    n = ids.shape[0]
    if v % 8:
        # the RMW unit is an aligned 8-row window; pad once here (a
        # full-table copy — callers on a hot path should allocate
        # 8-row-aligned tables so this branch never fires)
        v_pad = _round_up(v, 8)
        padded = jnp.zeros((v_pad, c), table.dtype).at[:v].set(table)
        return scatter_add_rows(padded, ids, grads, block=block,
                                window=window, interpret=interpret)[:v]
    order = jnp.argsort(ids)
    n_pad = _round_up(n, block)
    sids = jnp.full((n_pad + 1,), _SENT, jnp.int32).at[:n].set(
        ids[order].astype(jnp.int32))
    sgrads = jnp.zeros((n_pad, c), grads.dtype).at[:n].set(grads[order])

    grid = n_pad // block
    kernel = partial(_rmw_kernel, block=block, window=window,
                     last_g=grid - 1)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block, c), lambda g, _sids: (g, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=(
                [pltpu.VMEM((8, c), table.dtype) for _ in range(window)]
                + [pltpu.VMEM((8, c), table.dtype) for _ in range(window)]
                + [pltpu.SMEM((2,), jnp.int32),
                   pltpu.SemaphoreType.DMA((window,)),
                   pltpu.SemaphoreType.DMA((window,))]
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((v, c), table.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(sids, sgrads, table)


# ---------------------------------------------------------------------------
# 2. One-hot matmul gather / scatter (small V, MXU path)
# ---------------------------------------------------------------------------


def _split_bf16(x, split):
    """Split a f32 array into `split` bf16 planes summing to ~x."""
    if split == 1:
        return (x.astype(jnp.bfloat16),)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


_VT = 512  # V-tile width: deeper MXU contractions, fewer dot issues


def _gather_mm_kernel(ids_ref, tbl_ref, out_ref, *, v_tiles, split):
    ids = ids_ref[:]  # [B, 1] int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], _VT), 1)
    acc = jnp.zeros((ids.shape[0], out_ref.shape[1]), jnp.float32)
    for vt in range(v_tiles):
        onehot = (ids - vt * _VT == cols).astype(jnp.bfloat16)
        tile = tbl_ref[pl.ds(vt * _VT, _VT), :]
        planes = ((tile.astype(jnp.bfloat16),) if split == 1
                  else _split_bf16(tile.astype(jnp.float32), 2))
        for plane in planes:
            acc = acc + jax.lax.dot_general(
                onehot, plane,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("block", "split", "interpret"))
def gather_rows_matmul(table, ids, *, block=2048, split=2,
                       interpret=False):
    """table[ids] as a one-hot @ table MXU matmul (small V only).

    The [V, C] table is VMEM-resident across the whole grid; each
    N-block builds its one-hot tiles in VMEM and runs V/128 MXU
    matmuls. split=2 uses bf16x2 operand splitting (~f32 accurate).
    """
    v, c = table.shape
    n = ids.shape[0]
    v_pad = _round_up(v, _VT)
    n_pad = _round_up(n, block)
    tbl = table if v_pad == v else jnp.zeros(
        (v_pad, c), table.dtype).at[:v].set(table)
    ids_p = jnp.zeros((n_pad, 1), jnp.int32).at[:n, 0].set(
        ids.astype(jnp.int32))

    out = pl.pallas_call(
        partial(_gather_mm_kernel, v_tiles=v_pad // _VT, split=split),
        grid_spec=pl.GridSpec(
            grid=(n_pad // block,),
            in_specs=[
                pl.BlockSpec((block, 1), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((v_pad, c), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block, c), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        interpret=interpret,
    )(ids_p, tbl)
    return out[:n]


def _scatter_mm_kernel(ids_ref, grads_ref, _tbl_in, out_ref, acc,
                       *, v_tiles, split, last_g):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    ids = ids_ref[:]  # [B, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], _VT), 1)
    planes = _split_bf16(grads_ref[:].astype(jnp.float32), split)
    for vt in range(v_tiles):
        onehot = (ids - vt * _VT == cols).astype(jnp.bfloat16)
        upd = jnp.zeros((_VT, acc.shape[1]), jnp.float32)
        for plane in planes:
            upd = upd + jax.lax.dot_general(
                onehot, plane,
                (((0,), (0,)), ((), ())),  # [B,VT]^T @ [B,C]
                preferred_element_type=jnp.float32)
        acc[pl.ds(vt * _VT, _VT), :] += upd

    @pl.when(g == last_g)
    def _emit():
        out_ref[:] = _tbl_in[:] + acc[:]


@partial(jax.jit, static_argnames=("block", "split", "interpret"))
def scatter_add_matmul(table, ids, grads, *, block=2048, split=2,
                       interpret=False):
    """table.at[ids].add(grads) as one-hot^T @ grads on the MXU.

    Accumulates into a VMEM-resident [V_pad, C] f32 accumulator across
    N-blocks; adds the table once at the end. Requires
    V_pad * C * 4 <~ 10 MB (caller gates). Ids out of [0, v) (the
    padding rows) land in padded accumulator rows and are dropped.
    """
    v, c = table.shape
    n = ids.shape[0]
    v_pad = _round_up(v, _VT)
    n_pad = _round_up(n, block)
    tbl = table if v_pad == v else jnp.zeros(
        (v_pad, c), table.dtype).at[:v].set(table)
    # padding positions get id v (a padded accumulator row, dropped)
    pad_id = v if v_pad > v else v_pad  # v_pad == v: grow by one tile
    if v_pad == v:
        v_pad += _VT
        tbl = jnp.zeros((v_pad, c), table.dtype).at[:v].set(tbl)
    ids_p = jnp.full((n_pad, 1), pad_id, jnp.int32).at[:n, 0].set(
        ids.astype(jnp.int32))
    grads_p = jnp.zeros((n_pad, c), grads.dtype).at[:n].set(grads)

    grid = n_pad // block
    out = pl.pallas_call(
        partial(_scatter_mm_kernel, v_tiles=v_pad // _VT, split=split,
                last_g=grid - 1),
        grid_spec=pl.GridSpec(
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block, 1), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, c), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((v_pad, c), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((v_pad, c), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((v_pad, c), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((v_pad, c), jnp.float32),
        interpret=interpret,
    )(ids_p, grads_p, tbl)
    return out[:v]
