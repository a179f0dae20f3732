"""Native C++ loader parity tests (reference coverage: the gtest suite of
the C++ engine, e.g. euler/core/graph/graph_builder tests)."""
import numpy as np
import pytest

from euler_tpu.native import loader


def _numpy_csr(n, n_et, src, dst, etype, ew):
    perm = np.lexsort((dst, etype, src))
    s, t, d, w = src[perm], etype[perm], dst[perm], ew[perm]
    key = s.astype(np.int64) * n_et + t
    gp = np.zeros(n * n_et + 1, np.int64)
    np.add.at(gp, key + 1, 1)
    gp = np.cumsum(gp)
    return gp, d, w, perm


def test_native_available():
    assert loader.get_lib() is not None, "native core failed to compile"


def test_native_csr_matches_numpy():
    rng = np.random.default_rng(0)
    n, n_et, m = 500, 3, 20_000
    src = rng.integers(0, n, m).astype(np.int32)
    dst = rng.integers(0, n, m).astype(np.int32)
    et = rng.integers(0, n_et, m).astype(np.int32)
    w = rng.random(m).astype(np.float32)
    res = loader.build_csr_native(n, n_et, src, dst, et, w)
    assert res is not None
    gp, col, ws, cw, eid, perm = res
    gp2, col2, w2, perm2 = _numpy_csr(n, n_et, src, dst, et, w)
    np.testing.assert_array_equal(np.asarray(gp, np.int64), gp2)
    np.testing.assert_array_equal(col, col2)
    # weights may be permuted differently among equal (src,etype,dst)
    # triples; compare per-group multisets
    for k in range(n * n_et):
        a = np.sort(ws[gp[k]:gp[k + 1]])
        b = np.sort(w2[gp2[k]:gp2[k + 1]])
        np.testing.assert_allclose(a, b, rtol=1e-6)
    np.testing.assert_allclose(cw, np.cumsum(ws), rtol=1e-4)
    # eid maps back to original rows
    np.testing.assert_array_equal(src[eid], src[perm2])


def test_native_alias_distribution():
    rng = np.random.default_rng(1)
    w = rng.random(10_000).astype(np.float32)
    res = loader.build_alias_native(w)
    assert res is not None
    prob, alias = res
    n = len(w)
    draws = 400_000
    u1 = rng.random(draws)
    u2 = rng.random(draws)
    slot = np.minimum((u1 * n).astype(int), n - 1)
    pick = np.where(u2 < prob[slot], slot, alias[slot])
    freq = np.bincount(pick, minlength=n) / draws
    np.testing.assert_allclose(freq.sum(), 1.0)
    # compare aggregate distribution over coarse buckets
    want = w / w.sum()
    bucket = np.arange(n) // 100
    fb = np.bincount(bucket, freq)
    wb = np.bincount(bucket, want)
    np.testing.assert_allclose(fb, wb, atol=5e-4)


def test_graph_load_uses_native_and_matches(toy_graph, tmp_path):
    """End-to-end: store built with native path == numpy path."""
    from tests import fixtures
    from euler_tpu.graph import convert_json_graph, load_graph
    import euler_tpu.graph.convert as conv
    d1, d2 = tmp_path / "nat", tmp_path / "np"
    convert_json_graph(fixtures.toy_graph_json(), str(d1))
    # force numpy fallback
    import euler_tpu.native.loader as nat
    real = nat.build_csr_native
    nat.build_csr_native = lambda *a, **k: None
    try:
        convert_json_graph(fixtures.toy_graph_json(), str(d2))
        g1, g2 = load_graph(str(d1)), load_graph(str(d2))
    finally:
        nat.build_csr_native = real
    np.testing.assert_array_equal(np.asarray(g1.tensors.group_ptr),
                                  np.asarray(g2.tensors.group_ptr))
    np.testing.assert_array_equal(np.asarray(g1.tensors.adj_dst),
                                  np.asarray(g2.tensors.adj_dst))
    np.testing.assert_allclose(np.asarray(g1.tensors.adj_w),
                               np.asarray(g2.tensors.adj_w), rtol=1e-6)