"""Checkpoint / resume (Orbax) + preprocessing artifact cache.

Reference counterpart: the reference's only persistence is Struc2Vec's
stage pickles in `temp_path` (SURVEY.md §6). Here:

- `save_state` / `load_state` checkpoint any pytree of arrays (embedding
  tables, optimizer state, RNG key, step counter) via Orbax — the
  restartable-step-loop story for long multi-host runs;
- `cache_artifact` / `load_artifact` generalize the reference's
  `temp_path` idea: host-side preprocessing products (CSR, alias tables,
  struc2vec context graphs) cached on disk keyed by a content hash.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Optional

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_state(path: str, state: Any) -> None:
    """Checkpoint a pytree of arrays to `path` (overwrites)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)


def load_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; `template` fixes structure/dtypes."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def try_restore(path: str, expected_keys) -> Optional[Any]:
    """Restore a checkpoint if one exists; validate its schema.

    Returns None when no checkpoint is present. Raises ValueError when
    a checkpoint exists but lacks `expected_keys` (e.g. resuming a
    'rowshard' run from a 'dp'-mode checkpoint) — a silent restart
    from step 0 would retrain everything AND overwrite the old state.
    """
    if not os.path.exists(os.path.abspath(path)):
        return None
    state = load_state(path)
    missing = [k for k in expected_keys if k not in state]
    if missing:
        raise ValueError(
            f"checkpoint at {path!r} lacks keys {missing} "
            f"(has {sorted(state)}); it was written by a different "
            "trainer/mode — refusing to silently restart from step 0"
        )
    return state


def try_restore_sharded(path: str, template: Any) -> Optional[Any]:
    """Sharding-aware `try_restore`: arrays in `template` that are
    jax.Arrays are restored WITH their shardings — on a multi-host run
    each process reads only its own shards (no host gather), which is
    the Orbax global-array checkpoint path. Schema is validated against
    the template's keys via checkpoint metadata (same refusal semantics
    as `try_restore`)."""
    if not os.path.exists(os.path.abspath(path)):
        return None
    ocp = _ocp()
    abspath = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(abspath).item_metadata.tree
    missing = [k for k in template if k not in meta]
    if missing:
        raise ValueError(
            f"checkpoint at {path!r} lacks keys {missing} "
            f"(has {sorted(meta)}); it was written by a different "
            "trainer/mode — refusing to silently restart from step 0"
        )
    rargs = ocp.checkpoint_utils.construct_restore_args(template)
    return ckptr.restore(abspath, item=template, restore_args=rargs)


def maybe_save(path: str, every: int, n_calls: int, state_fn) -> bool:
    """Save `state_fn()` when the cadence hits; shared by trainers."""
    if not (path and every and n_calls % every == 0):
        return False
    save_state(path, state_fn())
    return True


def content_key(*arrays, extra: str = "") -> str:
    """Stable hash key for preprocessing artifacts."""
    h = hashlib.sha1()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    h.update(extra.encode())
    return h.hexdigest()[:16]


def cache_artifact(cache_dir: str, key: str, obj: Any) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    p = os.path.join(cache_dir, f"{key}.pkl")
    with open(p, "wb") as f:
        pickle.dump(obj, f)
    return p


def load_artifact(cache_dir: str, key: str) -> Optional[Any]:
    p = os.path.join(cache_dir, f"{key}.pkl")
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return pickle.load(f)
