"""Edge-partitioned distributed random walks (multi-host scaling path).

BASELINE north star: "graph edge-partitioned per host, boundary vertex
[state] exchanged all-to-all over ICI and overlapped with the walk step".
The reference has no analogue (joblib processes over a shared nx graph).

Design
------
- Vertices are range-partitioned: shard s owns ids [s·Vp, (s+1)·Vp).
  Each shard holds ONLY the CSR rows of its owned vertices (its outgoing
  edge partition), padded to the max shard size so shapes are uniform.
- Invariant: a walker always resides on the shard that owns its current
  vertex, so every next-hop gather is purely local.
- After each local step, walkers whose next vertex is owned elsewhere are
  routed with a bucketed `all_to_all`: walkers are binned by destination
  shard into fixed-capacity buckets (static shapes; `slack` oversizes the
  buckets, overflow is counted and those walkers die with -1 — size
  `slack` so this never fires in practice).
- Each shard records tokens for walkers it hosts into a (walk_id, t)
  buffer; buffers are summed across shards at the end (each cell is
  written by exactly one shard).

For corpora/graphs at the reference's scale the replicated engine in
`ops.walk` is faster (no routing); this engine is the scale-out path and
is validated on the 8-device CPU mesh in tests.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map


def partition_csr(graph, n_shards):
    """Range-partition the CSR by vertex; pad shards to common sizes.

    Returns dict of numpy arrays stacked over shards:
      row_ptr [n, Vp+1] (local offsets), col_idx [n, Emax], degree [n, Vp]
    plus vp (vertices per shard).
    """
    V = graph.num_nodes
    vp = (V + n_shards - 1) // n_shards
    row_ptrs, cols, degs = [], [], []
    e_max = 1
    for s in range(n_shards):
        lo, hi = min(s * vp, V), min((s + 1) * vp, V)
        rp_global = graph.row_ptr[lo : hi + 1].astype(np.int64)
        if rp_global.size == 0:  # shard owns no vertices (V < n·vp)
            rp_global = graph.row_ptr[-1:].astype(np.int64)
        local_rp = (rp_global - rp_global[0]).astype(np.int32)
        # pad vertex range to vp
        if hi - lo < vp:
            pad = np.full(vp - (hi - lo), local_rp[-1], dtype=np.int32)
            local_rp = np.concatenate([local_rp, pad])
        col = graph.col_idx[rp_global[0] : rp_global[-1]].astype(np.int32)
        row_ptrs.append(local_rp)
        cols.append(col)
        degs.append(np.diff(local_rp).astype(np.int32))
        e_max = max(e_max, col.shape[0])
    col_p = np.full((n_shards, e_max), -1, dtype=np.int32)
    for s in range(n_shards):
        col_p[s, : cols[s].shape[0]] = cols[s]
    return {
        "row_ptr": np.stack(row_ptrs),
        "col_idx": col_p,
        "degree": np.stack(degs),
        "vp": vp,
    }


def distributed_uniform_walks(
    mesh, *, length, vp, n_walkers, slack=4
):
    """Build the jitted distributed uniform-walk fn over `mesh`'s data axis.

    Returns fn(row_ptr [n,Vp+1], col_idx [n,E], degree [n,Vp],
               starts [n_walkers], key) -> walks [n_walkers, length].
    `starts` must be grouped so walker i starts on its owner shard — the
    wrapper `simulate_walks_distributed` handles grouping and ungrouping.
    """
    n = mesh.shape["data"]
    wl = n_walkers // n  # walkers hosted per shard (capacity)
    cap = wl * slack  # walker slots per shard
    bucket = cap // n  # per-destination bucket capacity

    def body(row_ptr, col_idx, degree, starts, key):
        # shard_map passes [1, ...] blocks (sharded leading axis): squeeze
        row_ptr = row_ptr[0]
        col_idx = col_idx[0]
        degree = degree[0]
        me = jax.lax.axis_index("data")
        # local walker state: vertex id (global), walk id; -1 = empty slot
        cur = jnp.full((cap,), -1, jnp.int32)
        wid = jnp.full((cap,), -1, jnp.int32)
        cur = cur.at[:wl].set(starts.reshape(-1))
        wid = wid.at[:wl].set(me * wl + jnp.arange(wl, dtype=jnp.int32))

        out = jnp.zeros((n_walkers, length), jnp.int32)

        def record(out, cur, wid, t):
            alive = wid >= 0
            safe_wid = jnp.where(alive, wid, 0)
            add = jnp.where(alive, cur + 1, 0)
            return out.at[safe_wid, t].add(add)

        out = record(out, cur, wid, 0)

        def step(carry, xs):
            cur, wid, out = carry
            t, k = xs
            alive = (wid >= 0) & (cur >= 0)
            local_v = jnp.where(alive, cur - me * vp, 0)
            deg = jnp.where(alive, degree[local_v], 0)
            u = jax.random.uniform(
                jax.random.fold_in(k, me), (cap,)
            )
            pick = jnp.minimum(
                (u * deg.astype(jnp.float32)).astype(jnp.int32),
                jnp.maximum(deg - 1, 0),
            )
            nxt = col_idx[row_ptr[local_v] + pick]
            nxt = jnp.where(alive & (deg > 0), nxt, -1)
            # dead walkers stop being routed
            wid = jnp.where(nxt >= 0, wid, -1)

            # ---- bucketed all-to-all routing by destination shard ----
            dest = jnp.where(wid >= 0, nxt // vp, n)  # n = trash bin
            # slot within destination bucket, by arrival order
            onehot = jax.nn.one_hot(dest, n + 1, dtype=jnp.int32)
            rank = jnp.cumsum(onehot, axis=0) - 1  # [cap, n+1]
            slot = jnp.take_along_axis(
                rank, dest[:, None], axis=1
            ).squeeze(1)
            ok = (slot < bucket) & (wid >= 0)
            overflow = jnp.sum((slot >= bucket) & (wid >= 0))

            send_v = jnp.full((n, bucket), -1, jnp.int32)
            send_w = jnp.full((n, bucket), -1, jnp.int32)
            d_safe = jnp.where(ok, dest, 0)
            s_safe = jnp.where(ok, slot, 0)
            send_v = send_v.at[d_safe, s_safe].set(
                jnp.where(ok, nxt, -1), mode="drop"
            )
            send_w = send_w.at[d_safe, s_safe].set(
                jnp.where(ok, wid, -1), mode="drop"
            )
            recv_v = jax.lax.all_to_all(
                send_v, "data", split_axis=0, concat_axis=0, tiled=False
            )
            recv_w = jax.lax.all_to_all(
                send_w, "data", split_axis=0, concat_axis=0, tiled=False
            )
            cur = recv_v.reshape(-1)
            wid = recv_w.reshape(-1)
            out = record(out, cur, wid, t)
            return (cur, wid, out), overflow

        keys = jax.random.split(key, length - 1)
        ts = jnp.arange(1, length, dtype=jnp.int32)
        (cur, wid, out), overflows = jax.lax.scan(
            step, (cur, wid, out), (ts, keys)
        )
        # merge shard-local buffers: each cell written by exactly one shard
        out = jax.lax.psum(out, "data")
        return out - 1, jax.lax.psum(overflows.sum(), "data")

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def simulate_walks_distributed(
    graph, mesh, num_walks, walk_length, key, slack=4
):
    """End-to-end distributed uniform walk corpus (grouped by owner)."""
    n = mesh.shape["data"]
    parts = partition_csr(graph, n)
    vp = parts["vp"]
    V = graph.num_nodes

    # walkers grouped by owner shard: shard s hosts starts in [s·vp,(s+1)·vp)
    starts_per_shard = []
    for s in range(n):
        lo, hi = s * vp, min((s + 1) * vp, V)
        ids = np.arange(lo, hi, dtype=np.int32)
        starts_per_shard.append(np.tile(ids, num_walks))
    wl = max(len(x) for x in starts_per_shard)
    starts = np.full((n, wl), -1, dtype=np.int32)
    for s, x in enumerate(starts_per_shard):
        starts[s, : len(x)] = x
    n_walkers = n * wl

    fn = distributed_uniform_walks(
        mesh, length=walk_length, vp=vp, n_walkers=n_walkers, slack=slack
    )
    walks, overflow = fn(
        jnp.asarray(parts["row_ptr"]),
        jnp.asarray(parts["col_idx"]),
        jnp.asarray(parts["degree"]),
        jnp.asarray(starts),
        key,
    )
    # drop filler walkers (start slot was -1 -> first token -1)
    walks = np.asarray(walks)
    keep = walks[:, 0] >= 0
    return walks[keep], int(overflow)
