"""Device mesh construction + distributed init.

The reference has NO distributed story (SURVEY.md §3.3 — single host,
joblib pipes); this module is new surface area mandated by the BASELINE
north star. Axes:

- `data`  — walk-block data parallelism (each group trains different
            blocks; tables averaged — the cross-host analogue of gensim's
            hogwild, see parallel/sgns.py);
- `model` — embedding-dimension tensor parallelism (column-sharded
            tables; logits psum over this axis — exact).

On a multi-host TPU slice call `init_distributed()` first (wraps
`jax.distributed.initialize`); in tests an 8-device CPU mesh comes from
`--xla_force_host_platform_device_count=8`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(**kwargs) -> None:
    """Multi-host SPMD init (no-op if single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axes: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    Default shape: all devices on the data axis, model=1 (shallow-model
    workloads shard best over data; pass an explicit shape for TP).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))
