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


def _triples(graph, n, seed=5, edge_type=-1):
    from euler_tpu.ops import sampling
    src, dst, ty, _ = sampling.sample_edge(
        graph.tensors, jax.random.PRNGKey(seed), n, edge_type)
    return np.stack([np.asarray(src), np.asarray(dst), np.asarray(ty)],
                    axis=1)


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
    ev = est.evaluate(_triples(graph, 64))
    assert np.isfinite(res["loss"]) and np.isfinite(ev["mrr"])


def test_edge_estimator_rejects_node_ids(sbm, tmp_path):
    ds, graph = sbm
    model = kg.TransE(n_entities=graph.meta.n_nodes,
                      n_relations=graph.meta.num_edge_types,
                      ent_dim=8, rel_dim=8)
    est = EdgeEstimator(model, graph, RunConfig(
        model_dir=str(tmp_path / "rej"), batch_size=16, total_steps=1,
        log_steps=0))
    with pytest.raises(ValueError, match="triples"):
        est.evaluate(np.arange(16))


def test_transe_mrr_improves(sbm, tmp_path):
    ds, graph = sbm
    model = kg.TransE(n_entities=graph.meta.n_nodes,
                      n_relations=graph.meta.num_edge_types,
                      ent_dim=16, rel_dim=16, num_negs=8)
    cfg = RunConfig(model_dir=str(tmp_path / "te"), batch_size=128,
                    total_steps=150, learning_rate=0.05, log_steps=0,
                    metric="mrr")
    est = EdgeEstimator(model, graph, cfg)
    test_triples = _triples(graph, 128)
    before = est.evaluate(test_triples)["mrr"]
    est.train()
    after = est.evaluate(test_triples)["mrr"]
    assert after > before + 0.05, (before, after)


@pytest.mark.parametrize("cls", [kg.TransE, kg.TransH, kg.TransR, kg.TransD,
                                 kg.DistMult])
def test_rank_all_entities_matches_bruteforce(sbm, tmp_path, cls):
    """rank_against_all must equal scoring each candidate entity through
    the model's own triple scorer; ranks must match a numpy argsort."""
    ds, graph = sbm
    g = graph.tensors
    E = graph.meta.n_nodes
    model = cls(n_entities=E, n_relations=graph.meta.num_edge_types,
                ent_dim=8, rel_dim=8)
    triples = _triples(graph, 6, seed=9)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)}, g,
                        jnp.asarray(triples))
    params = {"params": params["params"]}
    scores = np.asarray(model.apply(
        params, g, jnp.asarray(triples), method=model.rank_against_all,
        direction="tail"))
    # brute force: score (h, r, e) for every entity e via __call__'s
    # positive path by substituting the tail
    for row in range(len(triples)):
        h, _, r = triples[row]
        batch = np.stack([np.full(E, h), np.arange(E),
                          np.full(E, r)], axis=1).astype(np.int32)
        pos = np.asarray(model.apply(
            params, g, jnp.asarray(batch), method=model.rank_against_all,
            direction="tail"))
        # the diagonal of pos == scoring e as tail directly
        np.testing.assert_allclose(np.diag(pos), scores[row], rtol=2e-4,
                                   atol=2e-5)
    # rank bookkeeping vs numpy
    res = kg.rank_all_entities(model, params, g, triples, batch_size=4,
                               corrupt="tail")
    want_ranks = 1 + (scores >
                      scores[np.arange(len(triples)),
                             triples[:, 1]][:, None]).sum(1)
    assert res["mr"] == pytest.approx(want_ranks.mean())
    assert res["mrr"] == pytest.approx((1.0 / want_ranks).mean())


def test_rank_all_entities_filtered(sbm):
    """Known true triples are excluded from the candidate ranking."""
    ds, graph = sbm
    g = graph.tensors
    E = graph.meta.n_nodes
    model = kg.TransE(n_entities=E, n_relations=graph.meta.num_edge_types,
                      ent_dim=8, rel_dim=8)
    triples = _triples(graph, 8, seed=11)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)}, g,
                        jnp.asarray(triples))
    params = {"params": params["params"]}
    scores = np.asarray(model.apply(
        params, g, jnp.asarray(triples), method=model.rank_against_all,
        direction="tail"))
    # declare the top-scoring non-true candidate of each row as "known"
    pos_s = scores[np.arange(len(triples)), triples[:, 1]]
    masked = scores.copy()
    masked[np.arange(len(triples)), triples[:, 1]] = -np.inf
    best = masked.argmax(1)
    known = np.stack([triples[:, 0], best, triples[:, 2]], axis=1)
    raw = kg.rank_all_entities(model, params, g, triples, batch_size=4,
                               corrupt="tail")
    filt = kg.rank_all_entities(model, params, g, triples, batch_size=4,
                                corrupt="tail", filter_known=known)
    # every row whose best competitor was filtered improves by exactly the
    # rows where best scored above the positive
    gain = (scores[np.arange(len(triples)), best] > pos_s).sum()
    assert raw["mr"] - filt["mr"] == pytest.approx(gain / len(triples))
    assert filt["mr"] <= raw["mr"]


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
