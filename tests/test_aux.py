"""KNN, GraphConfig, dataset registry, hooks, profiler flag."""
import os

import numpy as np
import pytest

from euler_tpu.knn import KnnIndex
from euler_tpu.utils.config import GraphConfig, define_run_flags


def test_knn_l2_exact():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(500, 16)).astype(np.float32)
    ids = np.arange(1000, 1500)
    idx = KnnIndex(emb, ids, metric="l2")
    d, i = idx.search(emb[:5], k=3)
    # nearest neighbor of each point is itself, distance ~0
    assert np.array_equal(i[:, 0], ids[:5])
    assert np.allclose(d[:, 0], 0.0, atol=1e-3)
    # brute-force check row 0
    want = np.argsort(((emb - emb[0]) ** 2).sum(1))[:3]
    assert set(i[0].tolist()) == set(ids[want].tolist())


def test_knn_cosine_and_ip():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(100, 8)).astype(np.float32)
    q = emb[:3] * 5.0   # scaled copies: cosine still matches themselves
    idx = KnnIndex(emb, metric="cosine")
    _, i = idx.search(q, k=1)
    assert np.array_equal(i[:, 0], [0, 1, 2])
    idx_ip = KnnIndex(emb, metric="ip")
    d, _ = idx_ip.search(q, k=1)
    assert d.shape == (3, 1)


def test_knn_cli(tmp_path):
    from euler_tpu import knn as knn_mod
    emb = np.random.default_rng(2).normal(size=(50, 4)).astype(np.float32)
    np.save(tmp_path / "emb.npy", emb)
    out = tmp_path / "res.npz"
    knn_mod.main(["--embedding_file", str(tmp_path / "emb.npy"),
                  "--k", "5", "--out", str(out)])
    res = np.load(out)
    assert res["idx"].shape == (25, 5)


def test_embedding_serving_roundtrip(tmp_path):
    """HTTP embedding service over the estimator's infer output
    (the reference's serving tier analog, euler/service + knn/knn.py)."""
    import http.client
    import json as _json

    from euler_tpu import serving

    rng = np.random.default_rng(4)
    emb = rng.normal(size=(50, 8)).astype(np.float32)
    ids = np.arange(100, 150, dtype=np.int32)
    np.save(tmp_path / "embedding_0.npy", emb[:30])
    np.save(tmp_path / "ids_0.npy", ids[:30])
    np.save(tmp_path / "embedding_1.npy", emb[30:])
    np.save(tmp_path / "ids_1.npy", ids[30:])

    srv = serving.serve_embeddings(str(tmp_path), background=True)
    try:
        port = srv.server_port

        def rpc(method, path, body=None):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
            c.request(method, path,
                      _json.dumps(body) if body is not None else None)
            r = c.getresponse()
            out = _json.loads(r.read())
            c.close()
            return r.status, out

        st, h = rpc("GET", "/healthz")
        assert st == 200 and h["n"] == 50 and h["d"] == 8
        st, e = rpc("POST", "/embedding", {"ids": [100, 149, 999]})
        assert st == 200
        np.testing.assert_allclose(e["embeddings"][0], emb[0], rtol=1e-6)
        np.testing.assert_allclose(e["embeddings"][1], emb[49], rtol=1e-6)
        assert e["embeddings"][2] is None
        # knn by stored id: nearest neighbor of a point is itself
        st, k = rpc("POST", "/knn", {"id": 110, "k": 3})
        assert st == 200 and k["ids"][0] == 110
        # knn by raw vector
        st, k2 = rpc("POST", "/knn", {"vector": emb[7].tolist(), "k": 1})
        assert st == 200 and k2["ids"] == [107]
        st, err = rpc("POST", "/knn", {"k": 1})
        assert st == 400 and "error" in err
    finally:
        srv.shutdown()


def test_graph_config_parse():
    c = GraphConfig("mode=local;num_retries=3;ratio=0.5;flag=true")
    assert c.get_string("mode") == "local"
    assert c.get_int("num_retries") == 3
    assert c.get_float("ratio") == 0.5
    assert c.get_bool("flag") is True
    assert c.get_int("missing", 7) == 7
    assert "mode" in c
    c2 = GraphConfig({"a": 1})
    assert c2.get_int("a") == 1
    with pytest.raises(ValueError):
        GraphConfig("noequals")


def test_run_flags_defaults():
    args = define_run_flags().parse_args([])
    assert args.run_mode == "train" and args.optimizer == "adam"


@pytest.mark.parametrize("name", ["cora", "ppi", "fb15k", "ml_1m"])
def test_registry_synthetic_fallback(name, tmp_path):
    from euler_tpu.datasets import get_dataset
    ds = get_dataset(name, str(tmp_path))
    g = ds.load_graph()
    assert g.meta.n_nodes > 0
    assert len(ds.test_ids) >= 0
    if name == "fb15k":
        assert ds.test_triples.shape[1] == 3


def test_registry_cora_raw_parse(tmp_path):
    # minimal cora.content/cites fixture exercises the real parser
    raw = tmp_path / "cora"
    os.makedirs(raw)
    with open(raw / "cora.content", "w") as f:
        f.write("p1\t1\t0\t1\tml\n")
        f.write("p2\t0\t1\t0\tdb\n")
        f.write("p3\t1\t1\t0\tml\n")
    with open(raw / "cora.cites", "w") as f:
        f.write("p1\tp2\np2\tp3\npX\tp1\n")   # pX unknown -> dropped
    from euler_tpu.datasets import get_dataset
    ds = get_dataset("cora", str(tmp_path))
    g = ds.load_graph()
    assert g.meta.n_nodes == 3
    assert ds.feature_dim == 3 and ds.label_dim == 2
    assert g.tensors.n_edges == 4  # two cites, both directions


def test_profiler_hook(tmp_path):
    import jax
    import jax.numpy as jnp
    from euler_tpu.utils.hooks import ProfilerHook
    h = ProfilerHook(str(tmp_path / "prof"), start=1, steps=1)
    for step in range(1, 4):
        jnp.zeros(4).block_until_ready()
        h(step)
    h.close()
    assert os.path.isdir(tmp_path / "prof")


def test_unknown_dataset():
    from euler_tpu.datasets import get_dataset
    with pytest.raises(KeyError):
        get_dataset("nope")


def test_io_layer_local_and_remote(tmp_path):
    """utils.io: the FileIO-style abstraction (reference:
    euler/common/file_io.h:34 posix + pluggable HDFS) — local paths via
    stdlib; scheme:// paths need fsspec and fail with a clear error
    when it is absent."""
    from euler_tpu.utils import io as uio
    p = uio.join(str(tmp_path), "sub", "x.txt")
    with uio.open_file(p, "w") as f:     # creates parents
        f.write("hello")
    assert uio.exists(p)
    with uio.open_file(p, "r") as f:
        assert f.read() == "hello"
    assert uio.glob(uio.join(str(tmp_path), "sub", "*.txt")) == [p]
    assert uio.is_remote("gs://bucket/x") and not uio.is_remote(p)
    try:
        import fsspec  # noqa: F401
        has_fsspec = True
    except ImportError:
        has_fsspec = False
    if not has_fsspec:
        import pytest as _pytest
        with _pytest.raises(ImportError, match="fsspec"):
            uio.open_file("gs://bucket/x.txt")


def test_knn_ivfflat():
    """IVF coarse quantizer: full-probe search equals exact; modest
    nprobe keeps high recall (reference: faiss IndexIVFFlat mode)."""
    import numpy as np

    from euler_tpu.knn import IvfKnnIndex, KnnIndex
    rng = np.random.default_rng(0)
    emb = rng.normal(0, 1, (500, 16)).astype(np.float32)
    q = rng.normal(0, 1, (8, 16)).astype(np.float32)
    exact = KnnIndex(emb)
    ivf = IvfKnnIndex(emb, n_clusters=16, nprobe=4)
    _, ei = exact.search(q, 10)
    _, fi = ivf.search(q, 10, nprobe=16)        # full probe == exact
    for a, b in zip(ei, fi):
        assert set(a.tolist()) == set(b.tolist())
    _, pi = ivf.search(q, 10)                   # nprobe=4: recall check
    recall = np.mean([len(set(a) & set(b)) / 10
                      for a, b in zip(ei, pi)])
    assert recall > 0.6, recall
