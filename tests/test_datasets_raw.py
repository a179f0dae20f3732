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
