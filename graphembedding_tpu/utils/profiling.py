"""Tracing / profiling helpers (SURVEY.md §6 aux subsystem).

Reference counterpart: none (`verbose` prints only). Provides:

- `trace(path)`: context manager around `jax.profiler.trace` — writes a
  TensorBoard/Perfetto trace of everything inside;
- `sgns_roofline(...)`: analytic roofline for the walk-block SGNS step,
  used to sanity-check measured pairs/s against hardware limits
  (BASELINE: "kernels at speed-of-light per chip").
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass


@contextmanager
def trace(path: str):
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Roofline:
    flops: float
    hbm_bytes: float
    pairs: float
    rows: float = 0.0  # row gather/scatter issues per step
    # v5e nominal: 197 TFLOP/s bf16 (~49 f32), 819 GB/s HBM
    peak_flops: float = 49e12
    peak_bw: float = 819e9
    # measured effective per-row issue cost of the XLA gather/scatter
    # path on v5e (~10 ns/row; see train.skipgram's layout notes). For
    # this kernel's access pattern — tens of thousands of 512-byte rows
    # per step — row ISSUE, not bandwidth, is the binding memory limit.
    row_issue_s: float = 10e-9

    @property
    def t_compute(self):
        return self.flops / self.peak_flops

    @property
    def t_memory(self):
        return self.hbm_bytes / self.peak_bw

    @property
    def t_issue(self):
        return self.rows * self.row_issue_s

    @property
    def bound(self):
        t = {"compute": self.t_compute, "memory": self.t_memory,
             "issue": self.t_issue}
        return max(t, key=t.get)

    @property
    def pairs_per_s_ceiling(self):
        """Bandwidth/FLOP ceiling (ignores row-issue overhead) — the
        classic roofline; unreachable for gather-heavy kernels."""
        return self.pairs / max(self.t_compute, self.t_memory)

    @property
    def pairs_per_s_issue_ceiling(self):
        """Issue-aware ceiling: row gathers/scatters cost
        `row_issue_s` each and cannot overlap with themselves. The
        honest speed-of-light for this access pattern."""
        return self.pairs / max(
            self.t_compute, self.t_memory, self.t_issue
        )


def sgns_roofline(block_walks=252, walk_len=10, window=5, k_shared=64,
                  embed_dim=128, dtype_bytes=4, neg_share_packs=4):
    """Per-step roofline of the packed walk-block SGNS step."""
    L, W, D, K = walk_len, window, embed_dim, k_shared
    P = max(128 // L, 1)
    G = block_walks // P
    PL = P * L
    G2 = max(G // max(neg_share_packs, 1), 1)
    tokens = G * PL
    # matmuls: logits GxPLxPLxD, nlog GxPLxKxD, and 4 gradient matmuls
    flops = 2 * G * PL * D * (2 * PL + 2 * PL + K + K + K)
    # HBM rows: gather y (fused [V,2D] table: one row per token),
    # scatter d_tok (one fused row per token), negatives gather+scatter
    # per SHARING group (neg_share_packs divides the negative rows)
    rows = 2 * tokens + 2 * G2 * K
    hbm = rows * 2 * D * dtype_bytes * 2  # read+write of scatter-add
    # expected trained pairs per step on the canonical config
    pairs_per_walk = 2 * sum(
        (W - d + 1) / W for d in range(1, W + 1)
    ) * (L - W / 2) / L * L  # ~56 for L=10, W=5
    pairs = block_walks * min(pairs_per_walk, 2 * W * L)
    return Roofline(flops=float(flops), hbm_bytes=float(hbm),
                    pairs=float(pairs), rows=float(rows))
