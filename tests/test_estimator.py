"""End-to-end training tests: the 'minimum slice' milestone
(SURVEY.md §7 step 3) on a hermetic SBM graph instead of Cora."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.dataflow import flows
from euler_tpu.estimator.estimator import (EdgeEstimator, NodeEstimator,
                                           RunConfig)
from euler_tpu.models import encoders, gnn


@pytest.fixture(scope="module")
def sbm(tmp_path_factory):
    from euler_tpu.datasets.synthetic import SBMDataset
    d = tmp_path_factory.mktemp("sbm")
    ds = SBMDataset(str(d), n_nodes=300, n_classes=3, feat_dim=8, seed=1)
    graph = ds.load_graph()
    return ds, graph


def _node_model(ds, conv, flow):
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = gnn.GNNNet(conv=conv, flow=flow, dims=(32, 32),
                     feature=feat)
    return gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                              label_dim=ds.label_dim)


def test_gcn_whole_graph_learns_sbm(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = _node_model(ds, "gcn", flows.WholeDataFlow(2, [(et,)]))
    cfg = RunConfig(model_dir=str(tmp_path / "gcn"), batch_size=64,
                    total_steps=120, learning_rate=0.02, log_steps=0,
                    metric="f1")
    est = NodeEstimator(model, graph, cfg,
                        train_node_type=ds.train_node_type)
    est.train()
    res = est.evaluate(ds.test_ids)
    assert res["f1"] > 0.85, res


def test_sage_sampled_learns_sbm(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = _node_model(
        ds, "sage", flows.SageDataFlow([5, 5], [(et,), (et,)]))
    cfg = RunConfig(model_dir=str(tmp_path / "sage"), batch_size=64,
                    total_steps=150, learning_rate=0.02, log_steps=0)
    est = NodeEstimator(model, graph, cfg,
                        train_node_type=ds.train_node_type)
    est.train()
    res = est.evaluate(ds.test_ids)
    assert res["f1"] > 0.85, res


def test_reservoir_refresh_during_train(tmp_path):
    # groups with degree > FAN_D hold a pre-drawn reservoir; training must
    # redraw it every reservoir_refresh steps or long runs would only ever
    # see the first <= FAN_D distinct neighbors per high-degree node
    # (VERDICT r2 weak #2)
    from euler_tpu.datasets.random_graph import random_graph
    from euler_tpu.ops.alias import FAN_D
    graph = random_graph(120, FAN_D * 2, feat_dim=8, n_classes=2, seed=3)
    assert graph.tensors.fan_over_rows.shape[0] > 0  # reservoir rows exist
    before = np.asarray(graph.tensors.fan_pack).copy()
    feat = encoders.ShallowEncoder(dense_names=("feature",))
    net = gnn.GNNNet(conv="sage", flow=flows.SageDataFlow([4], [(0,)]),
                     dims=(8,), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name="label",
                               label_dim=2)
    cfg = RunConfig(model_dir=str(tmp_path / "rr"), batch_size=16,
                    total_steps=4, log_steps=0, reservoir_refresh=2)
    NodeEstimator(model, graph, cfg).train()
    after = np.asarray(graph.tensors.fan_pack)
    assert not np.array_equal(before, after)


def test_spmd_estimator_learns_sbm(sbm, tmp_path):
    """The mesh-parallel estimator (2 data x 4 graph shards on the
    virtual 8-device mesh) trains the same model the single-chip
    NodeEstimator does and reaches the same quality."""
    from euler_tpu.estimator.spmd import SpmdNodeEstimator
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = _node_model(ds, "sage", flows.SageDataFlow([5, 5],
                                                       [(et,), (et,)]))
    cfg = RunConfig(model_dir=str(tmp_path / "spmd"), batch_size=64,
                    total_steps=120, learning_rate=0.02, log_steps=0)
    est = SpmdNodeEstimator(model, graph, cfg, graph_shards=4,
                            train_node_type=graph.meta.node_type_id(
                                ds.train_node_type))
    est.train()
    res = est.evaluate(ds.test_ids)
    assert res["f1"] > 0.85, res
    emb = est.infer(ds.test_ids[:40], out_dir=str(tmp_path / "spmd_emb"))
    assert emb.shape[0] == 40 and np.isfinite(emb).all()


def test_infer_writes_embeddings(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = _node_model(ds, "gcn", flows.WholeDataFlow(1, [(et,)]))
    cfg = RunConfig(model_dir=str(tmp_path / "inf"), batch_size=64,
                    total_steps=1, log_steps=0)
    est = NodeEstimator(model, graph, cfg,
                        train_node_type=ds.train_node_type)
    ids = ds.test_ids[:50]
    emb = est.infer(ids, out_dir=str(tmp_path / "emb"))
    assert emb.shape == (len(ids), 32)
    import os
    assert os.path.exists(tmp_path / "emb" / "embedding_0.npy")


def test_checkpoint_roundtrip(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = _node_model(ds, "gcn", flows.WholeDataFlow(1, [(et,)]))
    cfg = RunConfig(model_dir=str(tmp_path / "ck"), batch_size=32,
                    total_steps=5, log_steps=0)
    est = NodeEstimator(model, graph, cfg,
                        train_node_type=ds.train_node_type)
    est.train()
    p1 = est.params
    # fresh estimator restores from model_dir
    est2 = NodeEstimator(model, graph, cfg,
                         train_node_type=ds.train_node_type)
    p2 = est2.params
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))


def test_unsupervised_mrr_improves(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    emb = gnn.EmbedOnly(max_id=ds.max_node_id, dim=16)
    ctx = gnn.EmbedOnly(max_id=ds.max_node_id, dim=16)
    model = gnn.UnsuperviseModel(embedder=emb, context_embedder=ctx,
                                 edge_types=(et,), num_negs=8)
    cfg = RunConfig(model_dir=str(tmp_path / "uns"), batch_size=128,
                    total_steps=200, learning_rate=0.05, log_steps=0,
                    metric="mrr")
    est = NodeEstimator(model, graph, cfg, train_node_type=-1)
    before = est.evaluate(np.arange(200))["mrr"]
    est.train()
    after = est.evaluate(np.arange(200))["mrr"]
    assert after > before + 0.1, (before, after)


def test_gae_estimator_id_file(sbm, tmp_path):
    """GaeEstimator: node-sampled training + id-file eval inputs
    (reference: gae_estimator.py get_input_from_id_file)."""
    from euler_tpu.estimator.estimator import GaeEstimator
    from euler_tpu.models import autoencoders
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = gnn.GNNNet(conv="sage", flow=flows.SageDataFlow([4], [(et,)]),
                     dims=(16, 16), feature=feat)
    model = autoencoders.GAE(embedder=net, edge_types=(et,), num_negs=3)
    cfg = RunConfig(model_dir=str(tmp_path / "gae_est"), batch_size=32,
                    total_steps=10, log_steps=0, metric="mrr",
                    save_steps=0)
    est = GaeEstimator(model, graph, cfg,
                       train_node_type=ds.train_node_type)
    est.train()
    idf = tmp_path / "ids.txt"
    idf.write_text("\n".join(str(i) for i in ds.test_ids[:40]))
    out = est.evaluate_id_file(str(idf))
    assert "mrr" in out and 0.0 <= out["mrr"] <= 1.0


def test_sample_estimator_trains_from_file(sbm, tmp_path):
    """SampleEstimator: batches come from the precomputed sample file,
    not on-graph sampling (reference: sample_estimator.py)."""
    import jax
    import numpy as np
    from euler_tpu.estimator.estimator import SampleEstimator
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = _node_model(ds, "sage", flows.SageDataFlow([4], [(et,)]))
    ids = np.asarray(ds.test_ids[:50])
    f = tmp_path / "samples.txt"
    f.write_text("\n".join(str(i) for i in ids))
    cfg = RunConfig(model_dir=str(tmp_path / "sample_est"),
                    batch_size=16, total_steps=12, log_steps=0,
                    save_steps=0)
    est = SampleEstimator(model, graph, cfg, samples=str(f))
    # batches draw only file rows
    batch = np.asarray(est.train_batch(graph.tensors,
                                       jax.random.PRNGKey(0)))
    assert batch.shape == (16,) and set(batch.tolist()) <= set(
        ids.tolist())
    out = est.train()
    assert np.isfinite(out["loss"])
