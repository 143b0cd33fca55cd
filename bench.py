"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: trained skip-gram pairs/s/chip (BASELINE.json's
north-star throughput) for DeepWalk on the Wiki-scale dataset, measured
warm on the flagship walk-block SGNS path. `vs_baseline` compares against
a reference-style CPU implementation (vectorized numpy SGNS at the
reference's effective batch=1 semantics is unrunnably slow; we grant the
baseline a generously batched numpy formulation, so the ratio is a lower
bound on the true speedup over the gensim-era stack).

Also reports walked-edges/s and the end-to-end micro-F1 so regressions in
quality or the walk engine are visible in the same line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure_tpu(n_warm=1, n_rep=4):
    import jax
    import jax.numpy as jnp

    from graphembedding_tpu.data import load_dataset
    from graphembedding_tpu.ops.walk import simulate_walks
    from graphembedding_tpu.train.skipgram import (
        SkipGramConfig,
        SkipGramTrainer,
        corpus_counts,
        negative_table,
        sgns_block_chunk,
    )

    ds = load_dataset("wiki")
    g = ds.graph

    # ---- walk throughput ------------------------------------------------
    key = jax.random.PRNGKey(0)
    walks = simulate_walks(g, 80, 10, key)  # compile + warm
    _ = float(walks[0, 0])
    # time a WINDOW of walk calls per sync (distinct keys — the tunnel
    # memoizes identical calls) so round-trip latency amortizes out, as
    # in the SGNS measurement below; 8 calls x 4 reps keeps the min
    # stable against shared-tunnel queueing spikes (observed 41-64M
    # spread at 4x3 on a busy day)
    walks_per_window = 8
    times = []
    for r in range(n_rep):
        t0 = time.time()
        acc = []
        for c in range(walks_per_window):
            w = simulate_walks(
                g, 80, 10, jax.random.PRNGKey(1 + r * walks_per_window + c)
            )
            acc.append(w)
        _ = float(jnp.stack([a[-1, -1] for a in acc]).sum())
        times.append(time.time() - t0)
    walked_edges = int(np.sum(np.asarray(w) >= 0) - w.shape[0])
    walk_eps = walks_per_window * walked_edges / min(times)

    # ---- SGNS throughput ------------------------------------------------
    cfg = SkipGramConfig(epochs=3)
    trainer = SkipGramTrainer(cfg)
    w_in, w_out = trainer.init_tables(g.num_nodes, jax.random.PRNGKey(1))
    table = jnp.asarray(
        negative_table(corpus_counts(np.asarray(walks), g.num_nodes))
    )
    S, Bw = cfg.chunk_steps, cfg.block_walks
    total = jnp.float32(10_000)

    def chunk(w_in, w_out, t):
        return sgns_block_chunk(
            w_in, w_out, walks, table, jax.random.PRNGKey(2),
            jnp.float32(cfg.alpha), jnp.float32(cfg.min_alpha),
            jnp.int32(t), total,
            chunk_steps=S, block_walks=Bw, window=cfg.window,
            negative=cfg.negative, k_shared=cfg.k_shared,
            neg_share_walks=cfg.neg_share_walks,
            neg_share_packs=cfg.neg_share_packs,
        )

    w_in, w_out, l, pairs = chunk(w_in, w_out, 0)  # compile + warm
    _ = float(l.mean())
    # time a WINDOW of chunks per sync so tunnel round-trip latency
    # amortizes out of the measurement
    chunks_per_window = 8
    times, pair_counts = [], []
    t = S
    for r in range(n_rep):
        t0 = time.time()
        total_pairs = 0.0
        acc = []
        for c in range(chunks_per_window):
            w_in, w_out, l, pairs = chunk(w_in, w_out, t)
            acc.append(pairs)
            t += S
        total_pairs = float(jnp.sum(jnp.stack([p.sum() for p in acc])))
        times.append(time.time() - t0)
        pair_counts.append(total_pairs)
    pairs_per_s = pair_counts[int(np.argmin(times))] / min(times)

    # ---- end-to-end quality (micro-F1 on the canonical eval) -------------
    from graphembedding_tpu.eval.classify import Classifier

    trainer_f1 = SkipGramTrainer(SkipGramConfig(epochs=3))
    w_in_f1, _, _ = trainer_f1.fit(walks, g.num_nodes, jax.random.PRNGKey(3))
    table_np = np.asarray(w_in_f1)
    emb = {
        g.vocab.idx2node[i]: table_np[i] for i in range(g.num_nodes)
    }
    res = Classifier(emb).split_train_evaluate(ds.X, ds.Y, 0.8, seed=0)

    # ---- dense expected-SGNS (round-3 capability, train/dense.py) -------
    from graphembedding_tpu.train.dense import DenseSGNSTrainer

    dtr = DenseSGNSTrainer(steps=100)
    w_d, _, _ = dtr.fit(walks, g.num_nodes)  # compile
    _ = float(w_d.sum())
    t0 = time.time()
    w_d, _, _ = DenseSGNSTrainer(steps=100, seed=1).fit(
        walks, g.num_nodes
    )
    _ = float(w_d.sum())
    dense_s = time.time() - t0
    emb_d = np.asarray(w_d)
    e_d = {g.vocab.idx2node[i]: emb_d[i] for i in range(g.num_nodes)}
    res_d = Classifier(e_d).split_train_evaluate(ds.X, ds.Y, 0.8,
                                                 seed=0)
    return walk_eps, pairs_per_s, res["micro"], dense_s, res_d["micro"]


def measure_offpath_walks(n_rep=3):
    """Walk throughput off the flagship path (VERDICT r3 item 3):
    node2vec exact/rejection and the struc2vec multilayer kernel, so
    the driver line catches regressions there too. Multilayer runs on
    a K=3 stack of the wiki CSR (uniform alias, gamma=1) — kernel
    throughput does not depend on the struc2vec preprocessing
    contents, only the structure shapes."""
    import jax
    import jax.numpy as jnp

    from graphembedding_tpu.data import load_dataset
    from graphembedding_tpu.models.struc2vec import multilayer_walks
    from graphembedding_tpu.ops.walk import simulate_walks

    ds = load_dataset("wiki")
    g = ds.graph
    out = {}

    for name, rej in (("node2vec_exact", False),
                      ("node2vec_rejection", True)):
        w = simulate_walks(g, 20, 10, jax.random.PRNGKey(0),
                           kind="node2vec", p=0.25, q=4.0,
                           use_rejection_sampling=rej)
        _ = float(w[0, 0])  # compile + warm
        # rate from MATCHED (edges, time) pairs per rep — each key
        # walks a different edge count at dead ends (the scaling.py
        # method)
        best_rate = 0.0
        for r in range(n_rep):
            t0 = time.time()
            w = simulate_walks(g, 20, 10, jax.random.PRNGKey(1 + r),
                               kind="node2vec", p=0.25, q=4.0,
                               use_rejection_sampling=rej)
            _ = float(jnp.sum(w[-1] >= 0))
            dt = time.time() - t0
            edges = int(np.sum(np.asarray(w) >= 0) - w.shape[0])
            best_rate = max(best_rate, edges / dt)
        out[f"{name}_edges_per_s"] = round(best_rate)

    # multilayer: K copies of the wiki CSR + its alias tables
    K = 3
    dg = g.device
    at = g.alias
    acc = jnp.broadcast_to(at.accept, (K, at.accept.shape[0]))
    ali = jnp.broadcast_to(at.alias, (K, at.alias.shape[0]))
    rp = jnp.broadcast_to(dg.row_ptr, (K, dg.row_ptr.shape[0]))
    ci = jnp.broadcast_to(dg.col_idx, (K, dg.col_idx.shape[0]))
    gamma = jnp.ones((K, g.num_nodes), jnp.float32)
    starts = jnp.tile(jnp.arange(g.num_nodes, dtype=jnp.int32), 20)
    w = multilayer_walks(rp, ci, acc, ali, gamma, starts,
                         jax.random.PRNGKey(0), 0.3, length=10)
    _ = float(w[0, 0])
    best = float("inf")
    for r in range(n_rep):
        t0 = time.time()
        w = multilayer_walks(rp, ci, acc, ali, gamma, starts,
                             jax.random.PRNGKey(1 + r), 0.3, length=10)
        _ = float(jnp.sum(w[-1] >= 0))
        best = min(best, time.time() - t0)
    edges = int(w.shape[0] * (w.shape[1] - 1))
    out["multilayer_edges_per_s"] = round(edges / best)
    return out


def measure_million(n_rep=3):
    """Large-V single-chip SGNS figure (VERDICT r3 item 7): steady-
    state pairs/s of the walk-block chunk at V=1M on a locality
    (clustered small-world) corpus — the RESULTS.md round-3 number,
    surfaced in the driver line. Rowshard over a real slice is the
    path past this single-chip scatter-latency wall (the [V,2D] table
    splits V/n per chip and per-shard scatter ranges shrink with n)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.million import clustered_graph
    from graphembedding_tpu.ops.walk import simulate_walks
    from graphembedding_tpu.train.skipgram import (
        SkipGramConfig,
        SkipGramTrainer,
        corpus_counts,
        negative_table,
    )

    V = 1_000_000
    g = clustered_graph(V, 10)
    walks = simulate_walks(g, 2, 10, jax.random.PRNGKey(0))
    table = jnp.asarray(
        negative_table(corpus_counts(np.asarray(walks), V))
    )
    from graphembedding_tpu.train.skipgram import plan_block_walks

    cfg = SkipGramConfig()
    trainer = SkipGramTrainer(cfg)
    # fused table via the trainer's one-allocation init (a concat of
    # split halves transiently doubles the footprint — the skipgram.py
    # OOM note), and the SHIPPED block policy, so the driver figure
    # tracks the real trainer path
    w_cat = trainer._init_cat(V, jax.random.PRNGKey(1))
    NW, L = walks.shape
    S, Bw = cfg.chunk_steps, plan_block_walks(NW, L, V, cfg)

    from graphembedding_tpu.train.skipgram import sgns_block_chunk_cat

    def chunk(w_cat, t):
        return sgns_block_chunk_cat(
            w_cat, walks, table, jax.random.PRNGKey(2),
            jnp.float32(cfg.alpha), jnp.float32(cfg.min_alpha),
            jnp.int32(t), jnp.float32(1e5),
            chunk_steps=S, block_walks=Bw, window=cfg.window,
            negative=cfg.negative, k_shared=cfg.k_shared,
            neg_share_walks=cfg.neg_share_walks,
            neg_share_packs=cfg.neg_share_packs,
            sparse_cap=True,
        )

    w_cat, l, pairs = chunk(w_cat, 0)
    _ = float(l.mean())
    t = S
    best = float("inf")
    best_pairs = 0.0
    for r in range(n_rep):
        t0 = time.time()
        acc = []
        for c in range(4):
            w_cat, l, pairs = chunk(w_cat, t)
            acc.append(pairs)
            t += S
        total_pairs = float(jnp.sum(jnp.stack([p.sum() for p in acc])))
        dt = time.time() - t0
        if dt < best:
            best, best_pairs = dt, total_pairs
    return round(best_pairs / best)


def measure_model_families(n_rep=2):
    """LINE / SDNE / Struc2Vec driver-visible throughput + quality.

    VERDICT r4 next-3: the driver line covered SGNS/walks only — a
    planted 2x slowdown in LINE's step, SDNE's epoch, or struc2vec's
    preprocessing was invisible. These figures make each family's hot
    loop move a driver-recorded number: LINE samples/s (second order,
    canonical batch), SDNE rows/s (dense full-batch AND sparse mode),
    struc2vec e2e seconds split preprocess/walk/train
    (flight-synthetic scale). Reference counterparts:
    `ge/models/{line,sdne,struc2vec}.py [U]`.
    """
    import time as _t

    import numpy as np

    from graphembedding_tpu.data import load_dataset
    from graphembedding_tpu.eval.classify import Classifier
    from graphembedding_tpu.models import LINE, SDNE, Struc2Vec

    def f1(ds, emb):
        return Classifier(emb).split_train_evaluate(
            ds.X, ds.Y, 0.8, seed=0)["micro"]

    out = {}
    ds = load_dataset("wiki")
    g = ds.graph
    V, E = g.num_nodes, g.num_edges

    # LINE second order: timed epochs AFTER a compile-warming run.
    # train() dispatches async — sync by pulling an embedding scalar
    # (the skill-documented float(sum) pattern) before reading clocks.
    batch, epochs = 1024, 80
    n_steps = max(int(round(epochs * E / batch)), 1)
    best = float("inf")
    m = None
    for r in range(n_rep + 1):
        m = LINE(g, embedding_size=128, order="second", seed=r)
        t0 = _t.time()
        m.train(batch_size=batch, epochs=epochs)
        float(m.second_emb.sum())
        dt = _t.time() - t0
        if r > 0:  # rep 0 pays compile
            best = min(best, dt)
    out["line_samples_per_s"] = round(n_steps * batch / best)
    out["line_micro_f1"] = round(float(f1(ds, m.get_embeddings())), 4)

    # SDNE dense full-batch rows/s (rows = V per epoch) + sparse mode
    epochs_s = 20
    best = float("inf")
    for r in range(n_rep + 1):
        s = SDNE(g, hidden_size=[256, 128], seed=r)
        t0 = _t.time()
        s.train(batch_size=V, epochs=epochs_s)
        dt = _t.time() - t0
        if r > 0:
            best = min(best, dt)
    out["sdne_dense_rows_per_s"] = round(V * epochs_s / best)
    out["sdne_micro_f1"] = round(float(f1(ds, s.get_embeddings())), 4)
    best = float("inf")
    for r in range(n_rep + 1):
        s = SDNE(g, hidden_size=[256, 128], seed=r)
        t0 = _t.time()
        s.train_sparse(epochs=epochs_s)
        dt = _t.time() - t0
        if r > 0:
            best = min(best, dt)
    out["sdne_sparse_rows_per_s"] = round(V * epochs_s / best)

    # Struc2Vec e2e on flight-synthetic: preprocess (context graph,
    # inside __init__ along with walks) / train split
    import tempfile

    from graphembedding_tpu.data.datasets import synthetic_flight

    fl = synthetic_flight(num_nodes=500, seed=11)
    with tempfile.TemporaryDirectory() as td:
        t0 = _t.time()
        sv = Struc2Vec(fl.graph, walk_length=10, num_walks=80,
                       temp_path=td, seed=0)
        t_pre = _t.time() - t0
        sv.train(embed_size=64, window_size=5, iter=3)  # compile warm
        t0 = _t.time()
        sv.train(embed_size=64, window_size=5, iter=3)
        t_train = _t.time() - t0
    out["struc2vec_preprocess_s"] = round(t_pre, 3)
    out["struc2vec_train_s"] = round(t_train, 3)
    out["struc2vec_micro_f1"] = round(
        float(f1(fl, sv.get_embeddings())), 4)
    out["struc2vec_note"] = (
        "500-node flight-synthetic, dtw_mode=fastdtw (radius-1, "
        "reference parity); preprocess includes context graph + "
        "multilayer walk corpus"
    )
    return out


def measure_cpu_baseline(max_seconds=20.0):
    """Reference-style numpy SGNS throughput (its delegated-native role).

    Vectorized numpy batch updates — strictly faster than the
    reference's actual per-pair Python/Cython path would be here, so the
    reported speedup is conservative. A true gensim `word2vec_inner`
    baseline is not possible in this environment: gensim is neither
    baked into the image nor installable (`import gensim` fails; package
    installs are disallowed and there is no network egress), so this
    synthetic numpy SGNS stands in and the JSON labels it as such
    (`baseline: synthetic-numpy-sgns`).
    """
    rng = np.random.default_rng(0)
    V, D, B, K = 2405, 128, 1024, 5
    w_in = rng.standard_normal((V, D)).astype(np.float32) * 0.01
    w_out = np.zeros((V, D), dtype=np.float32)
    lr = np.float32(0.025)
    n_pairs = 0
    t0 = time.time()
    while time.time() - t0 < max_seconds:
        c = rng.integers(0, V, B)
        x = rng.integers(0, V, B)
        negs = rng.integers(0, V, (B, K))
        u = w_in[c]
        v = w_out[x]
        vn = w_out[negs]
        g_pos = 1.0 / (1.0 + np.exp(-np.sum(u * v, -1))) - 1.0
        g_neg = 1.0 / (1.0 + np.exp(-np.einsum("bd,bkd->bk", u, vn)))
        d_u = g_pos[:, None] * v + np.einsum("bk,bkd->bd", g_neg, vn)
        np.add.at(w_in, c, -lr * d_u)
        np.add.at(w_out, x, -lr * (g_pos[:, None] * u))
        np.add.at(
            w_out,
            negs.reshape(-1),
            -lr * (g_neg[:, :, None] * u[:, None, :]).reshape(-1, D),
        )
        n_pairs += B
    return n_pairs / (time.time() - t0)


def _preflight(timeout_s=300):
    """Fail FAST (and loudly) if the shared TPU tunnel is down.

    Device enumeration normally returns in seconds; during the
    2026-08-20 outage it blocked INDEFINITELY inside the backend's C
    layer (uninterruptible by SIGALRM — verified) and then raised
    UNAVAILABLE, which would hang the driver's bench step. The probe
    therefore runs in a SUBPROCESS with a hard timeout, turning the
    hang into a quick, diagnosable nonzero exit (no JSON line is
    printed — the driver contract gets silence, not a fake number).
    Skippable via GE_TPU_SKIP_PREFLIGHT=1.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("GE_TPU_SKIP_PREFLIGHT"):
        return
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        ok = r.returncode == 0 and "ok" in r.stdout
        detail = (r.stderr or "")[-300:]
    except subprocess.TimeoutExpired:
        ok = False
        detail = f"jax.devices() did not return within {timeout_s}s"
    if not ok:
        print(
            "bench preflight failed — TPU backend unavailable "
            f"({detail}); see RESULTS.md round-4 outage note for the "
            "last verified numbers",
            file=sys.stderr,
        )
        raise SystemExit(3)


def main():
    _preflight()
    walk_eps, pairs_per_s, micro_f1, dense_s, dense_f1 = measure_tpu()
    baseline = measure_cpu_baseline()
    # off-path walk kernels + the 1M-node figure: soft-fail so the
    # driver line survives an extras-only breakage
    extra = {}
    try:
        extra.update(measure_offpath_walks())
    except Exception as e:  # pragma: no cover - defensive
        extra["offpath_walks"] = f"unavailable ({e})"
    try:
        extra["million_node_pairs_per_s"] = measure_million()
        extra["million_node_note"] = (
            "V=1M locality corpus, sparse-cap fused-table chunk at "
            "the trainer's 8x-block large-corpus policy (quality-"
            "validated; RESULTS.md r4 — scatter latency hides under "
            "more rows in flight); rowshard over a real slice is the "
            "path further: per-shard scatter ranges shrink V/n per "
            "chip — component costs measured (98 ns/row at a 1M-row "
            "table vs 37 ns at the 125k rows an 8-way shard owns, "
            "gather flat ~14 ns at any V; "
            "benchmarks/rowcost_vs_V_r04.jsonl), sharded-program "
            "composition pending a real multi-chip rowshard run (the "
            "recovery assumes each chip's program scatters only into "
            "its own V/n range)"
        )
    except Exception as e:  # pragma: no cover - defensive
        extra["million_node_pairs_per_s"] = f"unavailable ({e})"
    try:
        extra.update(measure_model_families())
    except Exception as e:  # pragma: no cover - defensive
        extra["model_families"] = f"unavailable ({e})"

    # analytic roofline of the measured step shape (BASELINE's
    # "speed-of-light per chip" evidence). Three bounds
    # (utils/profiling.py): the serial floor and the same-step
    # row-traffic time bracket the measurement (the kernel beats both
    # via compute-under-DMA and cross-step scatter pipelining); the
    # headline pct is against the steady-state PIPELINED ceiling
    # pairs/max(t_gather, t_scatter), which no schedule can beat.
    # Per-row costs are measured live on THIS device at the step's
    # exact shapes (benchmarks/row_issue.py)
    from graphembedding_tpu.train.skipgram import SkipGramConfig
    from graphembedding_tpu.utils.profiling import sgns_roofline

    cfg = SkipGramConfig()
    # the PUBLISHED ceiling uses the vetted idle-host constants
    # (utils/profiling.py defaults, benchmarks/row_issue.py
    # 2026-08-20) so pct_of_roofline is stable run to run; a live
    # re-measurement is attached as a diagnostic only — the shared
    # tunnel swings it ~2x with load, which would make the headline
    # percentage meaningless
    row_meta = {"row_cost_source": "vetted-constants "
                                   "(benchmarks/row_issue.py)"}
    try:
        from benchmarks.row_issue import measure_row_issue

        g_live, s_live, _ss, _rng = measure_row_issue(
            v=2405, c=2 * cfg.embed_size + 4, reps=2, window=32
        )
        row_meta["row_cost_live_ns"] = {
            "gather": round(g_live, 2), "scatter": round(s_live, 2)
        }
        # freshness bit (VERDICT r4 next-7): if the live measurement is
        # within ~1.3x of the vetted constants, the published roofline
        # pct still reflects this device; else keep the pct (stable
        # run-to-run by design) but FLAG the constants as stale so the
        # headline carries its own shelf life
        from graphembedding_tpu.utils.profiling import Roofline

        vetted_g = Roofline.gather_ns_per_row
        vetted_s = Roofline.scatter_ns_per_row
        drift = max(g_live / vetted_g, vetted_g / g_live,
                    s_live / vetted_s, vetted_s / s_live)
        if drift <= 1.3:
            row_meta["row_cost_source"] = (
                "re-vetted live this run (within 1.3x of "
                "benchmarks/row_issue.py constants)")
        else:
            row_meta["constants_stale"] = True
            row_meta["constants_drift_x"] = round(drift, 2)
    except Exception as e:
        row_meta["row_cost_live_ns"] = f"unavailable ({e})"
    roof = sgns_roofline(
        block_walks=cfg.block_walks, walk_len=10, window=cfg.window,
        k_shared=cfg.k_shared, embed_dim=cfg.embed_size,
        neg_share_packs=cfg.neg_share_packs,
    )
    ceil = roof.pairs_per_s_pipelined_ceiling
    rowtraffic = roof.pairs_per_s_rowtraffic_ceiling
    floor = roof.pairs_per_s_serial_floor
    print(
        json.dumps(
            {
                "metric": "trained_sgns_pairs_per_s_per_chip",
                "value": round(pairs_per_s),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / baseline, 2),
                "extras": {
                    "walked_edges_per_s": round(walk_eps),
                    "baseline": "synthetic-numpy-sgns",
                    "baseline_note": (
                        "gensim is not installable in this image "
                        "(no egress); vectorized numpy SGNS stands in, "
                        "so vs_baseline is a LOWER bound on the speedup "
                        "over the reference's gensim/Cython stack"
                    ),
                    "cpu_baseline_pairs_per_s": round(baseline),
                    "wiki_micro_f1": round(float(micro_f1), 4),
                    "dense_trainer_fit_s": round(dense_s, 3),
                    "dense_trainer_micro_f1": round(
                        float(dense_f1), 4
                    ),
                    "roofline_pairs_per_s": round(ceil),
                    "pct_of_roofline": round(
                        100.0 * pairs_per_s / ceil, 1
                    ),
                    "roofline_model": (
                        "steady-state pipelined ceiling pairs/"
                        "max(t_gather, t_scatter): with perfect "
                        "cross-step pipelining the sustained stage "
                        "time is the slower row stream; a true upper "
                        "bound no schedule of this step can beat "
                        "(utils/profiling.py). The same-step "
                        "row-traffic time and the serial floor are "
                        "reported as the bracket."
                    ),
                    "roofline_bound": roof.bound,
                    "rowtraffic_pairs_per_s": round(rowtraffic),
                    "x_of_rowtraffic": round(
                        pairs_per_s / rowtraffic, 2
                    ),
                    "serial_floor_pairs_per_s": round(floor),
                    "x_of_serial_floor": round(
                        pairs_per_s / floor, 2
                    ),
                    "roofline_phase_us": {
                        "gather": round(roof.t_gather * 1e6, 1),
                        "compute": round(roof.t_compute * 1e6, 1),
                        "vpu": round(roof.t_vpu * 1e6, 1),
                        "scatter": round(roof.t_scatter * 1e6, 1),
                    },
                    **row_meta,
                    **extra,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
