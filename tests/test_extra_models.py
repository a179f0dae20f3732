"""GAE/VGAE/DGI, GeniePath/LGCN, solution kit tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.dataflow import flows
from euler_tpu.estimator.estimator import NodeEstimator, RunConfig
from euler_tpu.models import autoencoders, encoders, extra_nets, gnn, solution


@pytest.fixture(scope="module")
def sbm(tmp_path_factory):
    from euler_tpu.datasets.synthetic import SBMDataset
    d = tmp_path_factory.mktemp("sbm_extra")
    ds = SBMDataset(str(d), n_nodes=200, n_classes=3, feat_dim=8, seed=7)
    return ds, ds.load_graph()


def _embedder(ds, graph, conv="sage"):
    et = graph.meta.edge_types.index("link")
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    return gnn.GNNNet(conv=conv,
                      flow=flows.SageDataFlow([4], [(et,)]),
                      dims=(16, 16), feature=feat), et


@pytest.mark.parametrize("cls", ["gae", "vgae", "dgi"])
def test_autoencoders_train(sbm, tmp_path, cls):
    ds, graph = sbm
    net, et = _embedder(ds, graph)
    if cls == "gae":
        model = autoencoders.GAE(embedder=net, edge_types=(et,), num_negs=3)
    elif cls == "vgae":
        model = autoencoders.VGAE(embedder=net, edge_types=(et,),
                                  num_negs=3)
    else:
        model = autoencoders.DGI(embedder=net, num_negs=3)
    cfg = RunConfig(model_dir=str(tmp_path / cls), batch_size=32,
                    total_steps=15, log_steps=0, metric="mrr",
                    learning_rate=0.02)
    est = NodeEstimator(model, graph, cfg)
    res = est.train()
    assert np.isfinite(res["loss"])


def test_geniepath_learns(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = extra_nets.GeniePathLazyNet(
        flow=flows.SageDataFlow([4, 4], [(et,), (et,)]),
        dims=(16, 16), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                               label_dim=ds.label_dim)
    cfg = RunConfig(model_dir=str(tmp_path / "gp"), batch_size=64,
                    total_steps=80, log_steps=0, learning_rate=0.02)
    est = NodeEstimator(model, graph, cfg,
                        train_node_type=ds.train_node_type)
    est.train()
    res = est.evaluate(ds.test_ids)
    assert res["f1"] > 0.6, res


def test_lgcn_forward(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = extra_nets.LGCNNet(
        flow=flows.SageDataFlow([6, 6], [(et,), (et,)]),
        dims=(16, 16), feature=feat, k=3)
    model = gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                               label_dim=ds.label_dim)
    cfg = RunConfig(model_dir=str(tmp_path / "lgcn"), batch_size=32,
                    total_steps=10, log_steps=0)
    est = NodeEstimator(model, graph, cfg,
                        train_node_type=ds.train_node_type)
    res = est.train()
    assert np.isfinite(res["loss"])


def test_solution_kit(sbm):
    ds, graph = sbm
    g = graph.tensors
    key = jax.random.PRNGKey(0)
    roots = jnp.arange(8, dtype=jnp.int32)
    pos, mask = solution.sample_pos_with_types(g, key, roots, (0,))
    assert pos.shape == (8, 1)
    negs = solution.sample_neg_with_types(g, key, roots, -1, 4)
    assert negs.shape == (8, 4)
    emb = jax.random.normal(key, (8, 16))
    head = solution.PosNegLogits()
    p, n = head.apply({}, emb, emb, jnp.stack([emb] * 4, 1))
    assert p.shape == (8, 1) and n.shape == (8, 4)
    assert np.isfinite(float(solution.xent_loss(p, n)))
    cos = solution.CosineLogits()
    c = cos.apply({}, emb, emb)
    np.testing.assert_allclose(np.asarray(c), 1.0, rtol=1e-5)

def test_group_gnn_independent_towers(sbm):
    """GroupGNNNet: one independent GNN per root group with separate
    parameters (reference: group_gnn.py:29-37)."""
    from euler_tpu.models.group_gnn import GroupGNNNet
    ds, graph = sbm
    g = graph.tensors
    net1, et = _embedder(ds, graph)
    net2, _ = _embedder(ds, graph)
    group = GroupGNNNet(gnns=(net1, net2))
    roots = jnp.asarray([0, 1, 2, 3], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    params = group.init(rngs, g, [roots, roots])
    outs = group.apply(params, g, [roots, roots],
                       rngs={"sample": jax.random.PRNGKey(1)})
    assert len(outs) == 2 and outs[0].shape == (4, 16)
    # towers are separate parameter sets -> same roots, different output
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))
    with pytest.raises(ValueError):
        group.apply(params, g, [roots],
                    rngs={"sample": jax.random.PRNGKey(1)})


def test_shared_group_gnn_shares_convs(sbm):
    """SharedGroupGNNNet: ONE conv stack + output fc across groups,
    per-group dataflows; whole flows rejected
    (reference: group_gnn.py:40-108)."""
    from euler_tpu.models.group_gnn import SharedGroupGNNNet
    ds, graph = sbm
    g = graph.tensors
    et = graph.meta.edge_types.index("link")
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = SharedGroupGNNNet(
        conv="sage",
        group_flows=(flows.SageDataFlow([4], [(et,)]),
                     flows.SageDataFlow([2, 2], [(et,), (et,)])),
        dims=(16, 16, 8), feature=feat)
    roots = jnp.asarray([0, 1, 2], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    params = net.init(rngs, g, [roots, roots])
    names = set(params["params"].keys())
    # one shared conv stack (dims[:-1]) + one shared fc, no per-group
    # duplicates (the 1-hop group simply uses the stack's prefix, the
    # reference's zip-truncation semantics)
    assert {"conv_0", "conv_1", "out_fc"} <= names
    assert not any(n.startswith("conv_2") for n in names)
    outs = net.apply(params, g, [roots, roots],
                     rngs={"sample": jax.random.PRNGKey(2)})
    assert [o.shape for o in outs] == [(3, 8), (3, 8)]

    whole = SharedGroupGNNNet(
        conv="sage", group_flows=(flows.WholeDataFlow(1, [(et,)]),),
        dims=(16, 16, 8), feature=feat)
    with pytest.raises(ValueError):
        whole.init(rngs, g, [roots])
