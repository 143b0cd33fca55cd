"""Edge-partitioned distributed random walks (multi-host scaling path).

BASELINE north star: "graph edge-partitioned per host, boundary vertex
[state] exchanged all-to-all over ICI and overlapped with the walk step".
The reference has no analogue (joblib processes over a shared nx graph;
`ge/walker.py — simulate_walks (~L100) [U]`).

Design
------
- Vertices are range-partitioned: shard s owns ids [s·Vp, (s+1)·Vp).
  Each shard holds ONLY the CSR rows (and alias tables / neighbor-matrix
  rows / layer CSRs) of its owned vertices, padded to the max shard size
  so shapes are uniform.
- Invariant: a walker always resides on the shard that owns its current
  vertex, so every next-hop gather is purely local.
- **Hub-safe routing**: after each local step, walker state is exchanged
  with ONE `all_gather` of the [cap, F] int32 state block and each shard
  compacts the walkers destined to it into its `cap` slots with a
  cumsum-rank + 1-D scatter (O(n·cap) work — no [cap, n] one_hot
  materialization, no per-(src,dst) bucket capacities to overflow). A
  walker is lost ONLY if more than `cap = walkers_per_shard · slack`
  walkers genuinely occupy one shard at once — a property of the graph's
  stationary distribution, not of which source shards they came from, so
  power-law hubs no longer overflow-kill walkers (the round-1 bucketed
  all_to_all dropped walkers whenever one source sent more than cap/n to
  one destination). Overflow is still counted and returned.
- Each shard records tokens for walkers it hosts into a (walk_id, t)
  buffer; buffers are summed across shards at the end (each cell is
  written by exactly one shard).

Four engines share the scheme:
  * first-order (uniform / weighted-alias)   — DeepWalk, weighted walks
  * exact (p,q) second-order                 — Node2Vec. The bias needs
    N(prev), which may live on another shard: prev's padded neighbor row
    is fetched per step with the same all_gather(ids) → owner-contribute
    → psum_scatter halo exchange the row-sharded trainer uses for
    embedding rows (parallel/rowshard.py) — SURVEY §3.3's
    boundary-vertex exchange, applied to adjacency rows.
  * multilayer (struc2vec)                   — K layer CSRs + alias
    tables partitioned by the same vertex ranges; layer moves stay local
    (the vertex doesn't change), only the in-layer hop routes.

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

_LANE = 128


# --------------------------------------------------------------------------- #
# host-side partitioners
# --------------------------------------------------------------------------- #


def partition_csr(graph, n_shards, edge_arrays=None):
    """Range-partition the CSR by vertex; pad shards to common sizes.

    Returns dict of numpy arrays stacked over shards:
      row_ptr [n, Vp+1] (local offsets), col_idx [n, Emax], degree [n, Vp]
    plus vp (vertices per shard). `edge_arrays` — optional dict
    name -> (array [E], fill) of edge-aligned arrays (alias tables,
    weights) to partition alongside col_idx.
    """
    V = graph.num_nodes
    vp = (V + n_shards - 1) // n_shards
    edge_arrays = edge_arrays or {}
    row_ptrs, degs = [], []
    cols = []
    extra = {name: [] for name in edge_arrays}
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
        sl = slice(int(rp_global[0]), int(rp_global[-1]))
        cols.append(graph.col_idx[sl].astype(np.int32))
        for name, (arr, _fill) in edge_arrays.items():
            extra[name].append(np.asarray(arr[sl]))
        row_ptrs.append(local_rp)
        degs.append(np.diff(local_rp).astype(np.int32))
        e_max = max(e_max, cols[-1].shape[0])
    col_p = np.full((n_shards, e_max), -1, dtype=np.int32)
    for s in range(n_shards):
        col_p[s, : cols[s].shape[0]] = cols[s]
    out = {
        "row_ptr": np.stack(row_ptrs),
        "col_idx": col_p,
        "degree": np.stack(degs),
        "vp": vp,
    }
    for name, (arr, fill) in edge_arrays.items():
        buf = np.full((n_shards, e_max), fill, dtype=arr.dtype)
        for s in range(n_shards):
            buf[s, : extra[name][s].shape[0]] = extra[name][s]
        out[name] = buf
    return out


def partition_neighbor_matrix(graph, n_shards):
    """Vertex-range partition of the padded dense neighbor matrix.

    Returns (nbr [n, Vp, Dpad] i32 pad -1, nbr_w [n, Vp, Dpad] f32
    pad 0, degree [n, Vp] i32, vp). Used by the distributed exact (p,q)
    engine: each shard holds only its owned rows, and remote rows are
    fetched through the halo exchange.
    """
    V = graph.num_nodes
    vp = (V + n_shards - 1) // n_shards
    nm = graph.neighbor_matrix
    nbr = np.asarray(nm.nbr)
    nbr_w = np.asarray(nm.nbr_w)
    dpad = nbr.shape[1]
    nbr_p = np.full((n_shards, vp, dpad), -1, dtype=np.int32)
    w_p = np.zeros((n_shards, vp, dpad), dtype=np.float32)
    deg_p = np.zeros((n_shards, vp), dtype=np.int32)
    for s in range(n_shards):
        lo, hi = min(s * vp, V), min((s + 1) * vp, V)
        nbr_p[s, : hi - lo] = nbr[lo:hi]
        w_p[s, : hi - lo] = nbr_w[lo:hi]
        deg_p[s, : hi - lo] = graph.degree[lo:hi]
    return nbr_p, w_p, deg_p, vp, dpad


def partition_layers(layers, num_nodes, n_shards):
    """Vertex-range partition of a struc2vec layer-CSR stack.

    `layers` is the `models.struc2vec.build_layer_csr` dict (numpy or
    jnp): row_ptr [K, V+1], col_idx/accept/alias [K, E], gamma [K, V].
    Returns dict stacked over shards: row_ptr [n, K, Vp+1] (local
    offsets), col_idx/accept/alias [n, K, Emax], gamma [n, K, Vp], vp.
    """
    rp = np.asarray(layers["row_ptr"])
    col = np.asarray(layers["col_idx"])
    acc = np.asarray(layers["accept"])
    ali = np.asarray(layers["alias"])
    gam = np.asarray(layers["gamma"])
    K = rp.shape[0]
    V = num_nodes
    vp = (V + n_shards - 1) // n_shards
    e_max = 1
    parts = []
    for s in range(n_shards):
        lo, hi = min(s * vp, V), min((s + 1) * vp, V)
        rows, cs, accs, alis, gs = [], [], [], [], []
        for k in range(K):
            rg = rp[k, lo : hi + 1].astype(np.int64)
            if rg.size == 0:
                rg = rp[k, -1:].astype(np.int64)
            lrp = (rg - rg[0]).astype(np.int32)
            if hi - lo < vp:
                lrp = np.concatenate(
                    [lrp, np.full(vp - (hi - lo), lrp[-1], np.int32)]
                )
            sl = slice(int(rg[0]), int(rg[-1]))
            rows.append(lrp)
            cs.append(col[k, sl])
            accs.append(acc[k, sl])
            alis.append(ali[k, sl])
            g = np.zeros(vp, np.float32)
            g[: hi - lo] = gam[k, lo:hi]
            gs.append(g)
            e_max = max(e_max, cs[-1].shape[0])
        parts.append((rows, cs, accs, alis, gs))
    out_rp = np.zeros((n_shards, K, vp + 1), np.int32)
    out_c = np.zeros((n_shards, K, e_max), np.int32)
    out_a = np.ones((n_shards, K, e_max), np.float32)
    out_l = np.zeros((n_shards, K, e_max), np.int32)
    out_g = np.zeros((n_shards, K, vp), np.float32)
    for s, (rows, cs, accs, alis, gs) in enumerate(parts):
        for k in range(K):
            out_rp[s, k] = rows[k]
            out_c[s, k, : cs[k].shape[0]] = cs[k]
            out_a[s, k, : accs[k].shape[0]] = accs[k]
            out_l[s, k, : alis[k].shape[0]] = alis[k]
            out_g[s, k] = gs[k]
    return {
        "row_ptr": out_rp,
        "col_idx": out_c,
        "accept": out_a,
        "alias": out_l,
        "gamma": out_g,
        "vp": vp,
    }


# --------------------------------------------------------------------------- #
# in-body collectives (shared by all engines)
# --------------------------------------------------------------------------- #


def _route(fields, dest, me, cap, n, axis):
    """Hub-safe walker routing: all_gather state + rank-compaction.

    fields: list of [cap] i32 walker-state arrays; dest [cap] i32
    destination shard (-1 = dead/empty slot). Returns (new_fields,
    overflow): each shard's compacted [cap] view of the walkers destined
    to it (-1 filled), and the count of walkers it had to drop because
    more than `cap` landed on it at once.
    """
    F = len(fields)
    send = jnp.stack(fields + [dest], axis=1)  # [cap, F+1]
    allw = jax.lax.all_gather(send, axis).reshape(n * cap, F + 1)
    mine = allw[:, F] == me
    rank = jnp.cumsum(mine.astype(jnp.int32)) - 1
    ok = mine & (rank < cap)
    slot = jnp.where(ok, rank, cap)  # cap = trash row
    buf = jnp.full((cap + 1, F), -1, jnp.int32)
    buf = buf.at[slot].set(
        jnp.where(ok[:, None], allw[:, :F], -1), mode="drop"
    )
    overflow = jnp.sum(mine) - jnp.sum(ok)
    return [buf[:cap, i] for i in range(F)], overflow


def _fetch_rows_i32(local_rows, ids, lo, vp, axis):
    """Halo fetch of int32 rows from their owner shards.

    local_rows [Vp, W]: this shard's row slice; ids [cap]: global row
    ids needed by this shard (-1 → zeros row). Same all_gather(ids) →
    owner-contribute → psum_scatter exchange as
    parallel/rowshard.fetch_rows, for adjacency rows instead of
    embedding rows. Returns [cap, W] i32.
    """
    ids_all = jax.lax.all_gather(ids, axis)  # [n, cap]
    local = ids_all - lo
    owned = (local >= 0) & (local < vp)
    rows = jnp.where(
        owned[..., None],
        local_rows[jnp.clip(local, 0, vp - 1)],
        0,
    )  # [n, cap, W]
    return jax.lax.psum_scatter(
        rows, axis, scatter_dimension=0, tiled=True
    )[0]


def _record(out, cur, wid, t):
    alive = wid >= 0
    safe_wid = jnp.where(alive, wid, 0)
    add = jnp.where(alive, cur + 1, 0)
    return out.at[safe_wid, t].add(add)


# --------------------------------------------------------------------------- #
# engines
# --------------------------------------------------------------------------- #


def _make_first_order(mesh, *, length, vp, n_walkers, slack, weighted):
    """First-order walk engine: uniform or weighted-alias next hops.

    Returns fn(row_ptr [n,Vp+1], col_idx [n,E], degree [n,Vp],
    [accept [n,E], alias [n,E] when weighted,] starts [n,wl], key)
    -> (walks [n_walkers, length], overflow).
    """
    n = mesh.shape["data"]
    wl = n_walkers // n
    cap = wl * slack

    def core(row_ptr, col_idx, degree, accept, alias, starts, key):
        me = jax.lax.axis_index("data")
        lo = me * vp
        cur = jnp.full((cap,), -1, jnp.int32)
        wid = jnp.full((cap,), -1, jnp.int32)
        cur = cur.at[:wl].set(starts.reshape(-1))
        wid = wid.at[:wl].set(me * wl + jnp.arange(wl, dtype=jnp.int32))
        # filler starts (-1) are empty slots
        wid = jnp.where(cur >= 0, wid, -1)

        out = jnp.zeros((n_walkers, length), jnp.int32)
        out = _record(out, cur, wid, 0)

        def step(carry, xs):
            cur, wid, out = carry
            t, k = xs
            alive = wid >= 0
            lv = jnp.where(alive, cur - lo, 0)
            deg = jnp.where(alive, degree[lv], 0)
            kk = jax.random.fold_in(k, me)
            u1 = jax.random.uniform(kk, (cap,))
            if weighted:
                from graphembedding_tpu.ops.alias import alias_draw

                u2 = jax.random.uniform(
                    jax.random.fold_in(kk, 1), (cap,)
                )
                pick = alias_draw(
                    accept, alias, row_ptr[lv], jnp.maximum(deg, 1),
                    u1, u2,
                )
            else:
                pick = jnp.minimum(
                    (u1 * deg.astype(jnp.float32)).astype(jnp.int32),
                    jnp.maximum(deg - 1, 0),
                )
            nxt = col_idx[row_ptr[lv] + pick]
            nxt = jnp.where(alive & (deg > 0), nxt, -1)
            wid = jnp.where(nxt >= 0, wid, -1)
            dest = jnp.where(wid >= 0, nxt // vp, -1)
            (cur, wid), overflow = _route(
                [nxt, wid], dest, me, cap, n, "data"
            )
            out = _record(out, cur, wid, t)
            return (cur, wid, out), overflow

        keys = jax.random.split(key, length - 1)
        ts = jnp.arange(1, length, dtype=jnp.int32)
        (cur, wid, out), overflows = jax.lax.scan(
            step, (cur, wid, out), (ts, keys)
        )
        out = jax.lax.psum(out, "data")
        return out - 1, jax.lax.psum(overflows.sum(), "data")

    if weighted:
        def body(row_ptr, col_idx, degree, accept, alias, starts, key):
            return core(row_ptr[0], col_idx[0], degree[0], accept[0],
                        alias[0], starts, key)

        in_specs = (P("data"),) * 5 + (P("data"), P())
    else:
        def body(row_ptr, col_idx, degree, starts, key):
            return core(row_ptr[0], col_idx[0], degree[0], None, None,
                        starts, key)

        in_specs = (P("data"),) * 3 + (P("data"), P())

    fn = shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_uniform_walks(mesh, *, length, vp, n_walkers, slack=4):
    """Uniform-next-hop distributed walks (round-1 API, hub-safe core).

    Returns fn(row_ptr, col_idx, degree, starts, key) ->
    (walks [n_walkers, length], overflow).
    """
    return _make_first_order(
        mesh, length=length, vp=vp, n_walkers=n_walkers, slack=slack,
        weighted=False,
    )


def distributed_weighted_walks(mesh, *, length, vp, n_walkers, slack=4):
    """Weighted first-order walks via partitioned per-node alias tables.

    Reference counterpart: the weighted branch of
    `ge/walker.py — node2vec_walk with p=q=1 [U]`. Returns
    fn(row_ptr, col_idx, degree, accept, alias, starts, key).
    """
    return _make_first_order(
        mesh, length=length, vp=vp, n_walkers=n_walkers, slack=slack,
        weighted=True,
    )


def distributed_node2vec_walks(
    mesh, *, length, vp, dpad, n_walkers, p, q, slack=4
):
    """Exact (p,q) second-order distributed walks.

    Reference counterpart: `ge/walker.py — node2vec_walk (~L35) [U]`.
    The bias class of each candidate x ∈ N(cur) w.r.t. prev needs
    N(prev), whose owner may be another shard: prev's padded
    neighbor-matrix row is halo-fetched each step (`_fetch_rows_i32`),
    then the same blocked dense membership compare as the single-chip
    kernel (`ops.walk.node2vec_walks`) scores candidates and Gumbel-max
    draws exactly. The first hop is a plain weighted draw, as in the
    single-chip kernel.

    Returns fn(nbr [n,Vp,Dpad], nbr_w [n,Vp,Dpad], degree [n,Vp],
    starts [n,wl], key) -> (walks, overflow).
    """
    n = mesh.shape["data"]
    wl = n_walkers // n
    cap = wl * slack
    inv_p = jnp.float32(1.0 / p)
    inv_q = jnp.float32(1.0 / q)

    def body(nbr, nbr_w, degree, starts, key):
        nbr = nbr[0]  # [Vp, Dpad]
        nbr_w = nbr_w[0]
        degree = degree[0]
        me = jax.lax.axis_index("data")
        lo = me * vp
        cur = jnp.full((cap,), -1, jnp.int32)
        wid = jnp.full((cap,), -1, jnp.int32)
        prev = jnp.full((cap,), -1, jnp.int32)
        cur = cur.at[:wl].set(starts.reshape(-1))
        wid = wid.at[:wl].set(me * wl + jnp.arange(wl, dtype=jnp.int32))
        wid = jnp.where(cur >= 0, wid, -1)

        out = jnp.zeros((n_walkers, length), jnp.int32)
        out = _record(out, cur, wid, 0)

        def step(carry, xs):
            prev, cur, wid, out = carry
            t, k = xs
            alive = wid >= 0
            lv = jnp.where(alive, cur - lo, 0)
            cand = nbr[lv]  # [cap, Dpad]
            w = nbr_w[lv]
            valid = w > 0

            # halo-fetch prev's neighbor row from its owner shard
            prev_row = _fetch_rows_i32(nbr, prev, lo, vp, "data")

            is_prev = cand == prev[:, None]
            # blocked dense membership compare (see ops.walk note: the
            # VPU compare beats per-element CSR binary search ~100x)
            C = min(8, dpad)
            n_chunks = (dpad + C - 1) // C

            def mem_chunk(j, acc):
                chunk = jax.lax.dynamic_slice_in_dim(
                    prev_row, j * C, C, axis=1
                )
                return acc | jnp.any(
                    cand[:, :, None] == chunk[:, None, :], axis=2
                )

            in_prev = jax.lax.fori_loop(
                0, n_chunks, mem_chunk,
                jnp.zeros((cap, dpad), bool),
            )
            bias = jnp.where(
                is_prev, inv_p, jnp.where(in_prev, 1.0, inv_q)
            )
            # first hop (t == 1) is an unbiased weighted draw
            bias = jnp.where(t == 1, 1.0, bias)
            w2 = w * bias
            g = -jnp.log(-jnp.log(jax.random.uniform(
                jax.random.fold_in(k, me), (cap, dpad),
                minval=1e-20, maxval=1.0) + 1e-20))
            score = jnp.where(
                valid, jnp.log(jnp.maximum(w2, 1e-30)) + g, -jnp.inf
            )
            pick = jnp.argmax(score, axis=1)
            nxt = cand[jnp.arange(cap), pick]
            deg = jnp.where(alive, degree[lv], 0)
            nxt = jnp.where(alive & (deg > 0), nxt, -1)
            wid = jnp.where(nxt >= 0, wid, -1)
            dest = jnp.where(wid >= 0, nxt // vp, -1)
            (cur2, wid, prev2), overflow = _route(
                [nxt, wid, cur], dest, me, cap, n, "data"
            )
            out = _record(out, cur2, wid, t)
            return (prev2, cur2, wid, out), overflow

        keys = jax.random.split(key, length - 1)
        ts = jnp.arange(1, length, dtype=jnp.int32)
        (prev, cur, wid, out), overflows = jax.lax.scan(
            step, (prev, cur, wid, out), (ts, keys)
        )
        out = jax.lax.psum(out, "data")
        return out - 1, jax.lax.psum(overflows.sum(), "data")

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_multilayer_walks(
    mesh, *, length, vp, n_walkers, stay_prob, max_moves=16, slack=4
):
    """Struc2Vec biased multilayer walks over partitioned layer CSRs.

    Reference counterpart: `ge/walker.py — BiasedWalker._exec_random_walk
    (~L200) [U]`; device semantics identical to the single-chip
    `models.struc2vec.multilayer_walks` (bounded in-step layer-move
    loop, forced step on loop exhaustion). Layer moves keep the vertex,
    so they are always shard-local; only the in-layer neighbor hop
    routes the walker.

    Returns fn(row_ptr [n,K,Vp+1], col_idx [n,K,E], accept [n,K,E],
    alias [n,K,E], gamma [n,K,Vp], starts [n,wl], key)
    -> (walks, overflow).
    """
    n = mesh.shape["data"]
    wl = n_walkers // n
    cap = wl * slack
    sp = jnp.float32(stay_prob)

    def body(row_ptr, col_idx, accept, alias, gamma, starts, key):
        row_ptr = row_ptr[0]  # [K, Vp+1]
        col_idx = col_idx[0]  # [K, E]
        accept = accept[0]
        alias_t = alias[0]
        gamma = gamma[0]  # [K, Vp]
        K, Vp1 = row_ptr.shape
        e_cols = col_idx.shape[1]
        me = jax.lax.axis_index("data")
        lo = me * vp

        rp_f = row_ptr.reshape(-1)
        col_f = col_idx.reshape(-1)
        acc_f = accept.reshape(-1)
        ali_f = alias_t.reshape(-1)
        gam_f = gamma.reshape(-1)

        def flat_rp(layer, lv):
            return rp_f[layer * Vp1 + lv]

        def deg_at(layer, lv):
            return flat_rp(layer, lv + 1) - flat_rp(layer, lv)

        def neighbor_step(layer, lv, v_global, k):
            d = deg_at(layer, lv)
            off = flat_rp(layer, lv)
            k1, k2 = jax.random.split(k)
            u1 = jax.random.uniform(k1, lv.shape)
            u2 = jax.random.uniform(k2, lv.shape)
            pick = jnp.minimum(
                (u1 * d.astype(jnp.float32)).astype(jnp.int32),
                jnp.maximum(d - 1, 0),
            )
            flat = layer * e_cols + off + pick
            take = u2 < acc_f[flat]
            slot = jnp.where(take, pick, ali_f[flat])
            nxt = col_f[layer * e_cols + off + slot]
            return jnp.where(d > 0, nxt, v_global)

        cur = jnp.full((cap,), -1, jnp.int32)
        wid = jnp.full((cap,), -1, jnp.int32)
        layer = jnp.zeros((cap,), jnp.int32)
        cur = cur.at[:wl].set(starts.reshape(-1))
        wid = wid.at[:wl].set(me * wl + jnp.arange(wl, dtype=jnp.int32))
        wid = jnp.where(cur >= 0, wid, -1)

        out = jnp.zeros((n_walkers, length), jnp.int32)
        out = _record(out, cur, wid, 0)

        def emit(carry, xs):
            cur, layer, wid, out = carry
            t, k = xs
            alive = wid >= 0
            lv = jnp.where(alive, cur - lo, 0)

            def move_body(i, state):
                layer, stepped, nxt, kk = state
                kk, kr, km, kn = jax.random.split(kk, 4)
                r = jax.random.uniform(kr, lv.shape)
                do_step = (r < sp) & ~stepped
                v_next = neighbor_step(layer, lv, cur, kn)
                nxt = jnp.where(do_step, v_next, nxt)
                stepped = stepped | do_step

                g = gam_f[layer * (Vp1 - 1) + lv]
                x = jnp.log(g + jnp.e)
                p_up = x / (x + 1.0)
                r2 = jax.random.uniform(km, lv.shape)
                # clamp the probe layer so the flat rp_f index stays in
                # bounds when layer+1 == K (the result is masked by
                # layer+1 < K either way, but correctness must not rest
                # on XLA's silent out-of-bounds gather clamp)
                up_probe = deg_at(jnp.minimum(layer + 1, K - 1), lv)
                can_up = (layer + 1 < K) & (up_probe > 0)
                go_up = (r2 <= p_up) & can_up
                go_down = (r2 > p_up) & (layer > 0)
                moving = ~stepped & ~do_step
                layer = jnp.where(
                    moving & go_up,
                    layer + 1,
                    jnp.where(moving & go_down, layer - 1, layer),
                )
                return layer, stepped, nxt, kk

            stepped0 = jnp.zeros_like(lv, dtype=bool)
            layer, stepped, nxt, kk = jax.lax.fori_loop(
                0, max_moves, move_body,
                (layer, stepped0, cur, jax.random.fold_in(k, me)),
            )
            k_force = jax.random.fold_in(jax.random.fold_in(k, me), 999)
            v_forced = neighbor_step(layer, lv, cur, k_force)
            nxt = jnp.where(stepped, nxt, v_forced)
            nxt = jnp.where(alive, nxt, -1)
            wid = jnp.where(nxt >= 0, wid, -1)
            dest = jnp.where(wid >= 0, nxt // vp, -1)
            (cur, wid, layer), overflow = _route(
                [nxt, wid, layer], dest, me, cap, n, "data"
            )
            layer = jnp.maximum(layer, 0)  # -1 fill on empty slots
            out = _record(out, cur, wid, t)
            return (cur, layer, wid, out), overflow

        keys = jax.random.split(key, length - 1)
        ts = jnp.arange(1, length, dtype=jnp.int32)
        (cur, layer, wid, out), overflows = jax.lax.scan(
            emit, (cur, layer, wid, out), (ts, keys)
        )
        out = jax.lax.psum(out, "data")
        return out - 1, jax.lax.psum(overflows.sum(), "data")

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data"),) * 5 + (P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


# --------------------------------------------------------------------------- #
# high-level wrappers
# --------------------------------------------------------------------------- #


def _group_starts(num_nodes, num_walks, n, vp):
    """Group walker start vertices by owner shard, pad with -1."""
    starts_per_shard = []
    for s in range(n):
        lo, hi = s * vp, min((s + 1) * vp, num_nodes)
        ids = np.arange(lo, hi, dtype=np.int32)
        starts_per_shard.append(np.tile(ids, num_walks))
    wl = max(len(x) for x in starts_per_shard)
    starts = np.full((n, wl), -1, dtype=np.int32)
    for s, x in enumerate(starts_per_shard):
        starts[s, : len(x)] = x
    return starts, n * wl


def simulate_walks_distributed(
    graph, mesh, num_walks, walk_length, key, *, kind="uniform",
    p=1.0, q=1.0, slack=4,
):
    """End-to-end distributed walk corpus (grouped by owner shard).

    kind: 'uniform' | 'weighted' | 'node2vec' — the distributed
    counterparts of `ops.walk.simulate_walks`. Returns
    (walks [kept, length] numpy, overflow count).
    """
    n = mesh.shape["data"]
    V = graph.num_nodes
    vp = (V + n - 1) // n
    starts, n_walkers = _group_starts(V, num_walks, n, vp)

    if kind == "uniform":
        parts = partition_csr(graph, n)
        fn = distributed_uniform_walks(
            mesh, length=walk_length, vp=vp, n_walkers=n_walkers,
            slack=slack,
        )
        walks, overflow = fn(
            jnp.asarray(parts["row_ptr"]),
            jnp.asarray(parts["col_idx"]),
            jnp.asarray(parts["degree"]),
            jnp.asarray(starts),
            key,
        )
    elif kind == "weighted":
        accept, alias = graph.host_alias()
        parts = partition_csr(
            graph, n,
            edge_arrays={
                "accept": (accept.astype(np.float32), 1.0),
                "alias": (alias.astype(np.int32), 0),
            },
        )
        fn = distributed_weighted_walks(
            mesh, length=walk_length, vp=vp, n_walkers=n_walkers,
            slack=slack,
        )
        walks, overflow = fn(
            jnp.asarray(parts["row_ptr"]),
            jnp.asarray(parts["col_idx"]),
            jnp.asarray(parts["degree"]),
            jnp.asarray(parts["accept"]),
            jnp.asarray(parts["alias"]),
            jnp.asarray(starts),
            key,
        )
    elif kind == "node2vec":
        nbr, nbr_w, deg, vp2, dpad = partition_neighbor_matrix(graph, n)
        assert vp2 == vp
        fn = distributed_node2vec_walks(
            mesh, length=walk_length, vp=vp, dpad=dpad,
            n_walkers=n_walkers, p=p, q=q, slack=slack,
        )
        walks, overflow = fn(
            jnp.asarray(nbr),
            jnp.asarray(nbr_w),
            jnp.asarray(deg),
            jnp.asarray(starts),
            key,
        )
    else:
        raise ValueError(f"unknown distributed walk kind: {kind!r}")

    # drop filler walkers (start slot was -1 -> first token -1)
    walks = np.asarray(walks)
    keep = walks[:, 0] >= 0
    return walks[keep], int(overflow)


def simulate_multilayer_walks_distributed(
    layers, num_nodes, mesh, num_walks, walk_length, key, *,
    stay_prob=0.3, max_moves=16, slack=4,
):
    """Distributed struc2vec multilayer walk corpus.

    `layers` is the `build_layer_csr` dict. Returns (walks, overflow).
    """
    n = mesh.shape["data"]
    vp = (num_nodes + n - 1) // n
    starts, n_walkers = _group_starts(num_nodes, num_walks, n, vp)
    parts = partition_layers(layers, num_nodes, n)
    fn = distributed_multilayer_walks(
        mesh, length=walk_length, vp=vp, n_walkers=n_walkers,
        stay_prob=stay_prob, max_moves=max_moves, slack=slack,
    )
    walks, overflow = fn(
        jnp.asarray(parts["row_ptr"]),
        jnp.asarray(parts["col_idx"]),
        jnp.asarray(parts["accept"]),
        jnp.asarray(parts["alias"]),
        jnp.asarray(parts["gamma"]),
        jnp.asarray(starts),
        key,
    )
    walks = np.asarray(walks)
    keep = walks[:, 0] >= 0
    return walks[keep], int(overflow)
