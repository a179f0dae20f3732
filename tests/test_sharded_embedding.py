"""Mesh-partitioned embedding tables (the reference's PS-sharded
Embedding, tf_euler/python/utils/layers.py partitioned tf.get_variable
— the model-parallel axis that makes DeepWalk/TransX feasible at
papers100M scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from euler_tpu.estimator.estimator import RunConfig
from euler_tpu.estimator.spmd import SpmdNodeEstimator
from euler_tpu.models import walk_models
from euler_tpu.models.layers import ShardedEmbedding
from euler_tpu.parallel import mesh as mesh_lib, sharded, train as train_lib


@pytest.fixture(scope="module")
def sbm(tmp_path_factory):
    from euler_tpu.datasets.synthetic import SBMDataset
    d = tmp_path_factory.mktemp("sbm_semb")
    ds = SBMDataset(str(d), n_nodes=100, n_classes=3, feat_dim=8, seed=3)
    return ds, ds.load_graph()


def test_sharded_embedding_lookup_layout(sbm):
    """Under the mesh, row r lives on shard r % S at local row r // S;
    the collective lookup must return exactly that row for every id and
    zeros for -1 padding."""
    _, graph = sbm
    num, dim, S = 50, 16, 8
    sg = sharded.build_sharded(graph, S)
    mesh = mesh_lib.make_mesh(data=1, graph=S)
    gspecs = sharded.shard_specs(sg)
    mod = ShardedEmbedding(num, dim)
    ids = jnp.asarray([0, 7, 49, -1, 13, 8, 1, 42], jnp.int32)

    def init_body(sgb, key):
        view = sharded.to_view(sgb, "graph")
        return mod.init({"params": key}, view, ids)

    def init_sm(out_specs):
        return jax.shard_map(init_body, mesh=mesh,
                             in_specs=(gspecs, P()),
                             out_specs=out_specs, check_vma=False)

    with mesh:
        abs_out = jax.eval_shape(init_sm(P()), sg, jax.random.PRNGKey(0))
        pspecs = train_lib.param_specs(abs_out)
        params = jax.jit(init_sm(pspecs))(sg, jax.random.PRNGKey(0))

    import flax.linen as nn
    table = params["params"]["embedding"]
    assert isinstance(table, nn.Partitioned)
    n_local = -(-num // S)
    glob = np.asarray(table.unbox())          # [S * n_local, dim]
    assert glob.shape == (S * n_local, dim)

    def apply_body(sgb, params, ids):
        view = sharded.to_view(sgb, "graph")
        return mod.apply(params, view, ids)

    with mesh:
        out = np.asarray(jax.jit(jax.shard_map(
            apply_body, mesh=mesh, in_specs=(gspecs, pspecs, P()),
            out_specs=P(), check_vma=False))(sg, params, ids))

    for i, r in enumerate(np.asarray(ids)):
        if r < 0:
            np.testing.assert_array_equal(out[i], 0.0)
        else:
            # global row r == stacked row (r % S) * n_local + r // S
            np.testing.assert_allclose(
                out[i], glob[(r % S) * n_local + r // S], rtol=1e-6)


def test_deepwalk_sharded_embeddings_train(sbm, tmp_path):
    """DeepWalk with shard_embeddings=True trains through the SPMD
    estimator: tables partitioned P('graph'), gradients flow through
    the owner-routed lookup, loss finite and decreasing-ish."""
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = walk_models.DeepWalk(
        n_nodes=graph.meta.n_nodes, dim=16, edge_types=(et,),
        walk_len=2, num_negs=4, shard_embeddings=True)
    cfg = RunConfig(model_dir=str(tmp_path / "dw_se"), batch_size=64,
                    total_steps=30, log_steps=0, learning_rate=0.1,
                    metric="mrr", steps_per_loop=5)
    est = SpmdNodeEstimator(model, graph, cfg)
    specs = est.pspecs
    leaf = specs["params"]["target_emb"]["embedding"]
    assert leaf == P("graph", None), leaf

    import flax.linen as nn
    before = np.asarray(
        est.params["params"]["target_emb"]["embedding"].unbox()).copy()
    res = est.train()
    assert np.isfinite(res["loss"])
    after = np.asarray(
        est.params["params"]["target_emb"]["embedding"].unbox())
    assert not np.allclose(before, after)       # the table trained
    # shard-distinct init: local blocks must not be copies of each other
    n_local = after.shape[0] // 8
    assert not np.allclose(before[:n_local], before[n_local:2 * n_local])


def test_sharded_embedding_single_chip_path(sbm):
    """Outside a mesh the module is a plain full table (same API)."""
    _, graph = sbm
    mod = ShardedEmbedding(20, 8)
    ids = jnp.asarray([0, 5, -1, 19])
    params = mod.init({"params": jax.random.PRNGKey(0)},
                      graph.tensors, ids)
    out = np.asarray(mod.apply(params, graph.tensors, ids))
    tab = np.asarray(params["params"]["embedding"])
    assert tab.shape == (20, 8)
    np.testing.assert_allclose(out[1], tab[5], rtol=1e-6)
    np.testing.assert_array_equal(out[2], 0.0)


def test_transe_sharded_embeddings_train(sbm, tmp_path):
    """TransE with the entity table partitioned over the mesh trains
    through SpmdEdgeEstimator (the papers100M-scale KG configuration)."""
    from euler_tpu.estimator.spmd import SpmdEdgeEstimator
    from euler_tpu.models import kg
    ds, graph = sbm
    model = kg.TransE(n_entities=graph.meta.n_nodes,
                      n_relations=graph.meta.num_edge_types,
                      ent_dim=16, rel_dim=16, num_negs=4,
                      shard_embeddings=True)
    cfg = RunConfig(model_dir=str(tmp_path / "te_se"), batch_size=64,
                    total_steps=10, log_steps=0, learning_rate=0.05,
                    metric="mrr", steps_per_loop=5)
    est = SpmdEdgeEstimator(model, graph, cfg)
    leaf = est.pspecs["params"]["entity_encoder"]["embedding"]
    assert leaf == P("graph", None), leaf
    res = est.train()
    assert np.isfinite(res["loss"])
    # eval through the mesh apply path too
    from euler_tpu.ops import sampling as _s
    src, dst, ty, _ = _s.sample_edge(graph.tensors,
                                     jax.random.PRNGKey(2), 64, -1)
    triples = np.stack([np.asarray(x) for x in (src, dst, ty)], axis=1)
    ev = est.evaluate(triples)
    assert np.isfinite(ev["mrr"])


def test_line_sharded_embeddings_train(sbm, tmp_path):
    ds, graph = sbm
    et = graph.meta.edge_types.index("link")
    model = walk_models.LINE(n_nodes=graph.meta.n_nodes, dim=8,
                             edge_types=(et,), order=2, num_negs=4,
                             shard_embeddings=True)
    cfg = RunConfig(model_dir=str(tmp_path / "line_se"), batch_size=64,
                    total_steps=10, log_steps=0, learning_rate=0.1,
                    metric="mrr")
    est = SpmdNodeEstimator(model, graph, cfg)
    res = est.train()
    assert np.isfinite(res["loss"])
