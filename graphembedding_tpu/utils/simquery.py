"""Embedding similarity queries (the gensim `wv.most_similar` role).

Reference counterpart: none in-repo, but reference users get this from
gensim's KeyedVectors on the `Word2Vec` object the models wrap
(`DeepWalk.train -> Word2Vec [U]`); `get_embeddings()` returns a plain
dict, so the query surface is reproduced here for migrating code:

    emb = model.get_embeddings()
    most_similar(emb, "42", topn=10)   # [(node, cosine), ...]

Small vocabularies run in numpy; large ones score on the accelerator
(one [V, D] x [D] matvec + top_k — milliseconds at 10^6 x 128).
"""

from __future__ import annotations

import numpy as np

# past this row count, scoring moves to the accelerator (a single
# matvec + top_k); below it numpy wins on dispatch overhead
_DEVICE_MIN_ROWS = 200_000


def _as_table(embeddings):
    """dict {node: vec} -> (names list, [V, D] f32 matrix)."""
    if isinstance(embeddings, dict):
        names = list(embeddings.keys())
        table = np.asarray(
            [embeddings[n] for n in names], dtype=np.float32
        )
        return names, table
    names, table = embeddings  # (names, matrix) pair
    return list(names), np.asarray(table, dtype=np.float32)


def _device_score(table, q, denom, k):
    """Jitted scorer hoisted to module level: repeated queries reuse
    the compiled program (k is a static arg) and jnp.asarray of the
    same host buffer hits the device cache rather than re-staging."""
    import jax
    import jax.numpy as jnp

    global _score_jit
    if _score_jit is None:
        def _score(tab, q, denom, k):
            sims = (tab @ q) / denom
            return jax.lax.top_k(sims, k)

        _score_jit = jax.jit(_score, static_argnames=("k",))
    return _score_jit(
        jnp.asarray(table), jnp.asarray(q), jnp.asarray(denom), k=k
    )


_score_jit = None


def most_similar(embeddings, node=None, vector=None, topn=10):
    """Top-`topn` cosine neighbors of `node` (or a raw `vector`).

    `embeddings`: the models' `get_embeddings()` dict, or a
    `(names, [V, D] matrix)` pair — pass the PAIR for repeated
    queries at scale (the dict form rebuilds the matrix per call;
    the pair form reuses it, and the jitted device scorer is cached
    across calls). Returns [(name, score), ...] in descending cosine
    similarity, excluding the query node itself.
    """
    if (node is None) == (vector is None):
        raise ValueError("pass exactly one of node= or vector=")
    names, table = _as_table(embeddings)
    if node is not None:
        try:
            qi = names.index(node)
        except ValueError:
            raise KeyError(f"unknown node {node!r}") from None
        q = table[qi]
    else:
        qi = -1
        q = np.asarray(vector, dtype=np.float32)

    norms = np.linalg.norm(table, axis=1)
    qn = np.linalg.norm(q)
    denom = np.maximum(norms * max(qn, 1e-12), 1e-12)

    k = min(topn + (1 if qi >= 0 else 0), table.shape[0])
    if table.shape[0] >= _DEVICE_MIN_ROWS:
        vals, idx = _device_score(table, q, denom, k)
        vals, idx = np.asarray(vals), np.asarray(idx)
    else:
        sims = (table @ q) / denom
        idx = np.argpartition(-sims, min(k, sims.shape[0] - 1))[:k]
        idx = idx[np.argsort(-sims[idx])]
        vals = sims[idx]
    out = [
        (names[i], float(v)) for i, v in zip(idx, vals) if i != qi
    ]
    return out[:topn]


def similarity(embeddings, a, b):
    """Cosine similarity between two nodes (gensim `wv.similarity`)."""
    names, table = _as_table(embeddings)
    try:
        ia, ib = names.index(a), names.index(b)
    except ValueError as e:  # match most_similar's (and gensim's)
        raise KeyError(str(e)) from None
    va, vb = table[ia], table[ib]
    return float(
        va @ vb
        / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-12)
    )
