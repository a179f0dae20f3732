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

def test_native_edge_list_parser_matches_python(tmp_path):
    """csrc etpu_parse_edge_list == the Python line loop on the same
    file (comments, blank lines, malformed rows, weights, CRLF)."""
    from euler_tpu.graph import stream_convert
    from euler_tpu.native import loader as native
    if native.get_lib() is None:
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(0)
    lines = ["# header comment", ""]
    for i in range(5000):
        s, d = rng.integers(0, 1000, 2)
        if i % 17 == 0:
            lines.append(f"{s}\t{d}")                 # no weight
        elif i % 29 == 0:
            lines.append("malformed row")
        else:
            lines.append(f"{s}\t{d}\t{(i % 7) + 0.5}")
    text = "\n".join(lines) + "\n"
    p = tmp_path / "edges.txt"
    p.write_text(text)

    res = native.parse_edge_list_native(text.encode())
    assert res is not None
    s_n, d_n, w_n = res

    s_p, d_p, w_p = [], [], []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) < 2 or line.lstrip().startswith("#") or \
                not parts[0].lstrip("-").isdigit() or \
                not parts[1].lstrip("-").isdigit():
            continue
        s_p.append(int(parts[0]))
        d_p.append(int(parts[1]))
        w_p.append(float(parts[2]) if len(parts) > 2 else 1.0)
    np.testing.assert_array_equal(s_n, s_p)
    np.testing.assert_array_equal(d_n, d_p)
    np.testing.assert_allclose(w_n, w_p, rtol=1e-6)

    # end-to-end through the streaming converter: same shard set as the
    # Python fallback path
    out_n = tmp_path / "out_native"
    out_p = tmp_path / "out_py"
    for o in (out_n, out_p):
        o.mkdir()
    stream_convert.convert_edge_list(str(p), str(out_n), n_partitions=2)
    real = native.get_lib
    try:
        native_get = native.get_lib
        native.get_lib = lambda: None      # force python path
        stream_convert.convert_edge_list(str(p), str(out_p),
                                         n_partitions=2)
    finally:
        native.get_lib = native_get
    from euler_tpu.graph import load_graph
    gn = load_graph(str(out_n)).tensors
    gp = load_graph(str(out_p)).tensors
    np.testing.assert_array_equal(np.asarray(gn.group_ptr),
                                  np.asarray(gp.group_ptr))
    np.testing.assert_allclose(np.asarray(gn.adj_w),
                               np.asarray(gp.adj_w), rtol=1e-6)
