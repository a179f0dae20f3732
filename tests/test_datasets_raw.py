"""Converter CLI round-trip + raw dataset parsers on miniature fixtures
(reference formats: euler/tools/generate_euler_data.py CLI,
Pubmed-Diabetes tab files, GraphSAGE ppi.zip json/npy)."""
import json
import os

import numpy as np

from tests.fixtures import toy_graph_json


def test_converter_cli_roundtrip(tmp_path):
    from euler_tpu.graph.convert import main
    from euler_tpu.graph.store import load_graph
    src = tmp_path / "graph.json"
    src.write_text(json.dumps(toy_graph_json()))
    out = tmp_path / "out"
    main([str(src), str(out), "2"])
    assert sorted(os.listdir(out)) == ["meta.json", "part_0.npz",
                                       "part_1.npz"]
    g = load_graph(str(out))
    assert g.meta.n_nodes == 8
    assert g.meta.n_edges == 11
    assert g.meta.n_partitions == 2


def test_pubmed_raw_parser(tmp_path):
    from euler_tpu.datasets.registry import Pubmed
    raw = tmp_path / "pubmed"
    raw.mkdir()
    # miniature Pubmed-Diabetes tab files: 4 papers, 3 features
    (raw / "Pubmed-Diabetes.DIRECTED.cites.tab").write_text(
        "DIRECTED\nNO_FEATURES\n"
        "0\tpaper:p1\t|\tpaper:p2\n"
        "1\tpaper:p2\t|\tpaper:p3\n"
        "2\tpaper:p4\t|\tpaper:p1\n")
    (raw / "Pubmed-Diabetes.NODE.paper.tab").write_text(
        "HEADER\ncat=1,2,3\tnumeric:w-a:0.0\tnumeric:w-b:0.0\t"
        "numeric:w-c:0.0\tstring:summary:\n"
        "p1\tlabel=1\tw-a=0.5\tw-b=0.5\tsummary=x\n"
        "p2\tlabel=2\tw-b=1.0\tsummary=x\n"
        "p3\tlabel=3\tw-c=2.0\tsummary=x\n"
        "p4\tlabel=1\tw-a=1.0\tw-c=1.0\tsummary=x\n")
    ds = Pubmed(str(tmp_path))
    ds.test_start_num = 2       # locals 3.. are test
    assert ds.has_raw()
    g = ds.load_graph()
    assert g.meta.n_nodes == 4
    assert ds.feature_dim == 3
    assert g.meta.n_edges == 3
    import jax.numpy as jnp
    from euler_tpu.ops import feature_ops
    feat, lab = feature_ops.get_dense_feature(
        g.tensors, jnp.arange(4), ["feature", "label"])
    feat, lab = np.asarray(feat), np.asarray(lab)
    # p1 = local 0: features (0.5, 0.5, 0) sum-normalized, label 0
    np.testing.assert_allclose(feat[0], [0.5, 0.5, 0.0], atol=1e-5)
    assert lab[0].argmax() == 0 and lab[1].argmax() == 1
    # p4 appears only in cites col 1 row 2 -> local id 3 -> test
    assert 3 in ds.test_ids


def test_ppi_raw_parser(tmp_path):
    from euler_tpu.datasets.registry import PPI
    raw = tmp_path / "ppi"
    raw.mkdir()
    G = {"nodes": [{"id": 0, "test": False, "val": False},
                   {"id": 1, "test": False, "val": False},
                   {"id": 2, "test": True, "val": False},
                   {"id": 3, "test": False, "val": True}],
         "links": [{"source": 0, "target": 1},
                   {"source": 1, "target": 2},
                   {"source": 0, "target": 3}]}
    (raw / "ppi-G.json").write_text(json.dumps(G))
    np.save(raw / "ppi-feats.npy",
            np.arange(8, dtype=np.float32).reshape(4, 2))
    (raw / "ppi-id_map.json").write_text(
        json.dumps({str(i): i for i in range(4)}))
    (raw / "ppi-class_map.json").write_text(
        json.dumps({str(i): [i % 2, 1 - i % 2] for i in range(4)}))
    ds = PPI(str(tmp_path))
    assert ds.has_raw()
    g = ds.load_graph()
    assert g.meta.n_nodes == 4
    assert ds.feature_dim == 2
    # undirected: each link materializes both directions
    assert g.meta.n_edges == 6
    # edge types: 0-1 is train; 1-2 and 0-3 touch eval nodes
    names = g.meta.edge_types
    assert set(names) == {"train", "train_removed"}
    assert list(ds.test_ids) == [2]
    import jax.numpy as jnp
    from euler_tpu.ops import feature_ops
    (feat,) = feature_ops.get_dense_feature(g.tensors, jnp.arange(4),
                                            ["feature"])
    np.testing.assert_allclose(np.asarray(feat),
                               np.arange(8).reshape(4, 2))


def test_reddit_raw_parser(tmp_path):
    """Miniature GraphSAGE reddit fixture: node_link graph with scalar
    class labels (reference: reddit.py + sage_util.load_data —
    train-standardized features, degree weights, train_removed edges)."""
    from euler_tpu.datasets.registry import Reddit
    raw = tmp_path / "reddit"
    raw.mkdir()
    G = {"nodes": [{"id": "n0"}, {"id": "n1"},
                   {"id": "n2", "val": True}, {"id": "n3", "test": True}],
         "links": [{"source": 0, "target": 1},
                   {"source": 1, "target": 2},
                   {"source": 3, "target": 0}]}
    (raw / "reddit-G.json").write_text(json.dumps(G))
    np.save(raw / "reddit-feats.npy",
            np.asarray([[1.0, 0.0], [3.0, 2.0], [5.0, 4.0], [7.0, 6.0]],
                       np.float32))
    (raw / "reddit-id_map.json").write_text(
        json.dumps({"n0": 0, "n1": 1, "n2": 2, "n3": 3}))
    (raw / "reddit-class_map.json").write_text(
        json.dumps({"n0": 0, "n1": 3, "n2": 1, "n3": 2}))
    ds = Reddit(str(tmp_path))
    ds.label_dim = 4
    assert ds.has_raw()
    g = ds.load_graph()
    assert g.meta.n_nodes == 4
    assert g.meta.n_edges == 6          # both directions
    assert set(g.meta.edge_types) == {"train", "train_removed"}
    import jax.numpy as jnp
    from euler_tpu.ops import feature_ops, sampling
    feat, lab = feature_ops.get_dense_feature(
        g.tensors, jnp.asarray(ds.graph.local_ids([0, 1, 2, 3]))
        if hasattr(ds, "graph") else jnp.arange(4), ["feature", "label"])
    feat, lab = np.asarray(feat), np.asarray(lab)
    # standardization over TRAIN rows (0, 1): mean (2,1), std (1,1)
    np.testing.assert_allclose(feat[0], [-1.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(feat[1], [1.0, 1.0], atol=1e-5)
    assert lab[1].argmax() == 3 and lab[3].argmax() == 2
    # node weight = degree: n1 has degree 2
    nw = np.asarray(g.tensors.node_w)
    assert nw[1] == 2.0 and nw[3] == 1.0
    # test ids = nodes flagged test
    assert ds.test_ids.tolist() == [3]


def test_mutag_raw_parser(tmp_path):
    """Miniature TU-format MUTAG files (reference: mutag.py +
    multigraph_util — 1-based ids, graph label max(lbl, 0))."""
    from euler_tpu.datasets.registry import Mutag
    raw = tmp_path / "mutag"
    raw.mkdir()
    # 2 graphs: nodes 1-3 -> graph 1 (label 1), nodes 4-6 -> graph 2
    # (label -1 -> 0)
    (raw / "MUTAG_A.txt").write_text(
        "1, 2\n2, 3\n3, 1\n4, 5\n5, 6\n")
    (raw / "MUTAG_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n2\n")
    (raw / "MUTAG_graph_labels.txt").write_text("1\n-1\n")
    (raw / "MUTAG_node_labels.txt").write_text("0\n1\n2\n0\n1\n6\n")
    ds = Mutag(str(tmp_path))
    assert ds.has_raw()
    g = ds.load_graph()
    assert g.meta.n_nodes == 6 and g.meta.n_edges == 5
    gm = np.asarray(g.tensors.graph_members)
    assert gm.shape[0] == 2
    assert set(gm[0][gm[0] >= 0].tolist()) == {0, 1, 2}
    assert set(gm[1][gm[1] >= 0].tolist()) == {3, 4, 5}
    import jax.numpy as jnp
    from euler_tpu.ops import feature_ops
    (lab,) = feature_ops.get_dense_feature(g.tensors, jnp.arange(6),
                                           ["label"])
    lab = np.asarray(lab)[:, 0]
    assert lab.tolist() == [1, 1, 1, 0, 0, 0]
    (f1,) = feature_ops.get_sparse_feature(g.tensors, jnp.arange(6),
                                           ["f1"])
    ids = np.asarray(f1[0])[:, 0]
    assert ids.tolist() == [0, 1, 2, 0, 1, 6]
    assert ds.total_size == 2


def test_parity_harness_on_cora_fixture(tmp_path):
    """tools/parity_run.py: runs the BASELINE.md config on datasets with
    raw files present, skips the rest cleanly (VERDICT r3 #6)."""
    sys_path_added = False
    import sys
    root = os.path.join(os.path.dirname(__file__), "..")
    if os.path.abspath(os.path.join(root, "tools")) not in sys.path:
        sys.path.insert(0, os.path.abspath(root))
        sys_path_added = True
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "parity_run", os.path.join(root, "tools", "parity_run.py"))
        parity = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(parity)

        # miniature cora-format raw fixture: 30 papers, 8 features
        raw = tmp_path / "cora"
        raw.mkdir()
        rng = np.random.default_rng(0)
        n = 30
        lines = []
        for i in range(n):
            fv = rng.integers(0, 2, 8)
            lab = f"class{i % 3}"
            lines.append("\t".join([f"p{i}"] + [str(v) for v in fv]
                                   + [lab]))
        (raw / "cora.content").write_text("\n".join(lines) + "\n")
        cites = [f"p{rng.integers(0, n)}\tp{rng.integers(0, n)}"
                 for _ in range(80)]
        (raw / "cora.cites").write_text("\n".join(cites) + "\n")

        results = parity.run_parity(
            data_dir=str(tmp_path), only="_cora", steps=30,
            model_dir=str(tmp_path / "models"), log=lambda *a: None)
        by_run = {r["run"]: r for r in results}
        gcn = by_run["gcn_cora"]
        assert gcn["status"] == "ran", gcn
        assert np.isfinite(gcn["value"]) and gcn["delta"] is not None
        # datasets without raw files skip cleanly
        skipped = parity.run_parity(
            data_dir=str(tmp_path), only="gin_mutag",
            log=lambda *a: None)
        assert skipped[0]["status"] == "skipped"
    finally:
        if sys_path_added:
            sys.path.pop(0)


def test_triple_dataset_test_triples_survive_reload(tmp_path):
    """A fresh dataset object over an already-converted dir must still
    expose test_triples (found via the parity sweep: the transh/r/d rows
    errored because the split only existed on first conversion)."""
    from euler_tpu.datasets.registry import FB15K
    d1 = FB15K(str(tmp_path))
    t1 = d1.test_triples
    assert t1.shape[1] == 3
    d2 = FB15K(str(tmp_path))     # fresh object, converted dir exists
    t2 = d2.test_triples
    np.testing.assert_array_equal(t1, t2)
