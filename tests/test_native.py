import numpy as np
import pytest

from graphembedding_tpu import native
from graphembedding_tpu.data.datasets import synthetic_flight
from graphembedding_tpu.models import struc2vec as s2v


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def test_native_struc2vec_matches_python_pipeline(monkeypatch):
    g = synthetic_flight(num_nodes=30, seed=8).graph
    le_native, nl_native = s2v.build_context_graph(g, opt1=True, opt2=True)

    def boom(*a, **k):
        raise RuntimeError("forced python fallback")

    monkeypatch.setattr(native, "native_struc2vec_distances", boom)
    le_py, nl_py = s2v.build_context_graph(g, opt1=True, opt2=True)

    assert nl_native == nl_py
    for k in range(nl_py):
        assert set(le_native[k]) == set(le_py[k])
        for key in le_py[k]:
            assert le_native[k][key] == pytest.approx(le_py[k][key],
                                                      rel=1e-9)


def test_native_dtw_matches_python():
    rng = np.random.default_rng(0)
    a = np.sort(rng.integers(1, 20, 7)).astype(np.float64)
    b = np.sort(rng.integers(1, 20, 5)).astype(np.float64)
    # RLE with count 1 each
    a_rle = np.stack([a, np.ones_like(a)], 1)
    b_rle = np.stack([b, np.ones_like(b)], 1)
    want = s2v._dtw(a_rle, b_rle, opt1=True)
    got = native.native_dtw(a_rle.reshape(-1), b_rle.reshape(-1),
                            opt1=True)
    assert got == pytest.approx(want, rel=1e-9)


def test_struc2vec_distances_thread_invariant():
    """The threaded C++ context-graph pipeline (workers=N) produces
    exactly the single-thread result — per-root BFS and per-pair DTW
    are independent, so striping them across threads must not change
    a single distance."""
    import numpy as np

    from graphembedding_tpu.data.datasets import synthetic_wiki
    from graphembedding_tpu.models.struc2vec import build_context_graph

    ds = synthetic_wiki(num_nodes=150, num_classes=3, avg_degree=7,
                        seed=2)
    e1, n1 = build_context_graph(ds.graph, workers=1)
    e4, n4 = build_context_graph(ds.graph, workers=4)
    assert n1 == n4
    assert len(e1) == len(e4)
    for d1, d4 in zip(e1, e4):
        assert d1.keys() == d4.keys()
        for k in d1:
            np.testing.assert_allclose(d1[k], d4[k], rtol=0, atol=0)
