"""KG embeddings, walk models, and graph classification end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.estimator.estimator import (EdgeEstimator, GraphEstimator,
                                           NodeEstimator, RunConfig)
from euler_tpu.models import graph_model, kg, pooling, walk_models
from euler_tpu.models import encoders, gnn
from euler_tpu.dataflow import flows


@pytest.fixture(scope="module")
def sbm(tmp_path_factory):
    from euler_tpu.datasets.synthetic import SBMDataset
    d = tmp_path_factory.mktemp("sbm_kg")
    ds = SBMDataset(str(d), n_nodes=200, n_classes=3, feat_dim=8, seed=3)
    return ds, ds.load_graph()


@pytest.fixture(scope="module")
def motif(tmp_path_factory):
    from euler_tpu.datasets.synthetic import MotifDataset
    d = tmp_path_factory.mktemp("motif")
    ds = MotifDataset(str(d), n_graphs=40, seed=1)
    return ds, ds.load_graph()


@pytest.mark.parametrize("cls", [kg.TransE, kg.TransH, kg.TransR, kg.TransD,
                                 kg.DistMult])
def test_kg_models_train(sbm, tmp_path, cls):
    ds, graph = sbm
    model = cls(n_entities=graph.meta.n_nodes,
                n_relations=graph.meta.num_edge_types,
                ent_dim=16, rel_dim=16, num_negs=4)
    cfg = RunConfig(model_dir=str(tmp_path / cls.__name__), batch_size=64,
                    total_steps=30, learning_rate=0.05, log_steps=0,
                    metric="mrr")
    est = EdgeEstimator(model, graph, cfg)
    res = est.train()
    ev = est.evaluate(np.arange(64))
    assert np.isfinite(res["loss"]) and np.isfinite(ev["mrr"])


def test_transe_mrr_improves(sbm, tmp_path):
    ds, graph = sbm
    model = kg.TransE(n_entities=graph.meta.n_nodes,
                      n_relations=graph.meta.num_edge_types,
                      ent_dim=16, rel_dim=16, num_negs=8)
    cfg = RunConfig(model_dir=str(tmp_path / "te"), batch_size=128,
                    total_steps=150, learning_rate=0.05, log_steps=0,
                    metric="mrr")
    est = EdgeEstimator(model, graph, cfg)
    before = est.evaluate(np.arange(128))["mrr"]
    est.train()
    after = est.evaluate(np.arange(128))["mrr"]
    assert after > before + 0.05, (before, after)


def test_deepwalk_trains(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = walk_models.DeepWalk(n_nodes=graph.meta.n_nodes, dim=16,
                                 edge_types=(et,), walk_len=3,
                                 num_negs=4)
    cfg = RunConfig(model_dir=str(tmp_path / "dw"), batch_size=64,
                    total_steps=60, learning_rate=0.05, log_steps=0,
                    metric="mrr")
    est = NodeEstimator(model, graph, cfg)
    before = est.evaluate(np.arange(64))["mrr"]
    est.train()
    after = est.evaluate(np.arange(64))["mrr"]
    assert after > before, (before, after)


def test_node2vec_biased(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = walk_models.Node2Vec(n_nodes=graph.meta.n_nodes, dim=8,
                                 edge_types=(et,), walk_len=2,
                                 num_negs=2, walk_p=0.5, walk_q=2.0)
    cfg = RunConfig(model_dir=str(tmp_path / "n2v"), batch_size=32,
                    total_steps=5, log_steps=0, metric="mrr")
    est = NodeEstimator(model, graph, cfg)
    res = est.train()
    assert np.isfinite(res["loss"])


def test_line_orders(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    for order in (1, 2):
        model = walk_models.LINE(n_nodes=graph.meta.n_nodes, dim=8,
                                 edge_types=(et,), order=order, num_negs=4)
        cfg = RunConfig(model_dir=str(tmp_path / f"line{order}"),
                        batch_size=64, total_steps=20, log_steps=0,
                        learning_rate=0.05, metric="mrr")
        est = NodeEstimator(model, graph, cfg)
        res = est.train()
        assert np.isfinite(res["loss"])


def test_graph_classification_learns(motif, tmp_path):
    ds, graph = motif
    g = graph.tensors
    assert g.graph_members is not None
    assert g.graph_members.shape[0] == 40
    et = 0
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    batch = 16
    maxn = int(g.graph_members.shape[1])
    net = gnn.GNNNet(conv="gin",
                     flow=flows.SageDataFlow([5, 5], [(et,), (et,)]),
                     dims=(32, 32), feature=feat)
    model = graph_model.GraphModel(
        embedder=net,
        pool=pooling.SegmentPool(aggr="mean", num_graphs=batch),
        label_dim=ds.num_classes)
    cfg = RunConfig(model_dir=str(tmp_path / "gc"), batch_size=batch,
                    total_steps=120, learning_rate=0.01, log_steps=0)
    est = GraphEstimator(model, graph, cfg, label_name=ds.label_idx,
                         num_classes=ds.num_classes)
    est.train()
    res = est.evaluate(np.arange(40))
    assert res["accuracy"] > 0.9, res


def test_pooling_layers(motif):
    ds, graph = motif
    g = graph.tensors
    x = jax.random.normal(jax.random.PRNGKey(0), (20, 8))
    gi = jnp.asarray([0] * 10 + [1] * 10)
    mask = jnp.ones((20,))
    for pool in (pooling.SegmentPool(aggr="max", num_graphs=2),
                 pooling.AttentionPool(num_graphs=2),
                 pooling.Set2SetPool(num_graphs=2, dim=8)):
        params = pool.init(jax.random.PRNGKey(1), x, gi, mask)
        out = pool.apply(params, x, gi, mask)
        assert out.shape[0] == 2
        assert np.isfinite(np.asarray(out)).all()
