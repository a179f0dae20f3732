"""Query builder (GQL facade), sparse_get_adj, util ops tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.graph.store import load_graph
from euler_tpu.ops import sampling, util_ops
from euler_tpu.query import Query, udf_max, udf_mean
from tests.fixtures import EDGES, EXT_IDS


@pytest.fixture(scope="module")
def toy(toy_dir_module):
    return load_graph(toy_dir_module)


@pytest.fixture(scope="module")
def toy_dir_module(tmp_path_factory):
    from euler_tpu.graph import convert_json_graph
    from tests.fixtures import toy_graph_json
    d = tmp_path_factory.mktemp("toy_query")
    convert_json_graph(toy_graph_json(), str(d), n_partitions=2)
    return str(d)


def _lid(g, ext):
    return g.local_id(ext)


def test_v_samplenb_values(toy):
    g = toy
    click = g.meta.edge_type_id("click")
    ids = jnp.asarray([_lid(g, 100), _lid(g, 102)], jnp.int32)
    out = (Query(g).v(ids)
           .sampleNB((click,), 8).alias("nb")
           .values("dense2").alias("f")
           .run(jax.random.PRNGKey(0)))
    nb = out["nb"]
    assert nb.ids.shape == (2, 8)
    # 100 -clicks-> {101, 103}; 102 -clicks-> {101}
    n100 = {_lid(g, 101), _lid(g, 103)}
    assert set(np.asarray(nb.ids[0]).tolist()) <= n100
    assert set(np.asarray(nb.ids[1]).tolist()) == {_lid(g, 101)}
    # features gathered for the flattened neighbor block
    assert out["f"].shape == (16, 2)
    ext_of = np.asarray(g.ext_ids)
    got = np.asarray(out["f"])[:, 0]
    want = ext_of[np.asarray(nb.ids).reshape(-1)]
    assert np.allclose(got, want)


def test_sampleN_conditional(toy):
    g = toy
    # price = 2.5 * local_enumeration_index; sample only price >= 10
    out = (Query(g).sampleN(-1, 64).ge("price", 10.0)
           .alias("n").run(jax.random.PRNGKey(1)))
    ids = np.asarray(out["n"].ids)
    assert (ids >= 0).all()
    price = np.asarray(g.tensors.dense_nf["price"])[ids, 0]
    assert (price >= 10.0).all()


def test_hasLabel_filters_type(toy):
    g = toy
    out = (Query(g).sampleN(-1, 32).hasLabel("user")
           .run(jax.random.PRNGKey(2)))
    ids = np.asarray(out["_frontier"].ids)
    ut = g.meta.node_type_id("user")
    assert (np.asarray(g.tensors.node_type)[ids] == ut).all()


def test_sampleE_outV_inV(toy):
    g = toy
    buy = g.meta.edge_type_id("buy")
    out = (Query(g).sampleE(buy, 32).alias("e")
           .inV().alias("dst").run(jax.random.PRNGKey(3)))
    e = out["e"]
    buys = {(s, d) for s, d, t, w in EDGES if t == "buy"}
    ext = np.asarray(g.ext_ids)
    got = {(int(ext[s]), int(ext[d]))
           for s, d in zip(np.asarray(e.src), np.asarray(e.dst))}
    assert got <= buys
    assert np.array_equal(np.asarray(out["dst"].ids), np.asarray(e.dst))


def test_order_by_limit(toy):
    g = toy
    click = g.meta.edge_type_id("click")
    ids = jnp.asarray([_lid(g, 100)], jnp.int32)
    out = (Query(g).v(ids).sampleNB((click,), 8)
           .order_by("weight", desc=True).limit(3)
           .run(jax.random.PRNGKey(4)))
    f = out["_frontier"]
    assert f.ids.shape == (1, 3)
    w = np.asarray(f.weights[0])
    assert (np.diff(w) <= 1e-6).all()  # descending


def test_values_udf_and_label(toy):
    g = toy
    ids = jnp.asarray([_lid(g, 100), _lid(g, 101)], jnp.int32)
    out = (Query(g).v(ids).values(udf_mean("dense2")).alias("m")
           .label().alias("t").run(jax.random.PRNGKey(5)))
    want = np.asarray(g.tensors.dense_nf["dense2"])[np.asarray(ids)].mean(-1)
    assert np.allclose(np.asarray(out["m"]).ravel(), want, atol=1e-5)
    assert np.array_equal(np.asarray(out["t"]),
                          np.asarray(g.tensors.node_type)[np.asarray(ids)])


def test_e_lookup(toy):
    g = toy
    out = Query(g).e(jnp.asarray([0, 3], jnp.int32)).run(
        jax.random.PRNGKey(6))
    f = out["_frontier"]
    ext = np.asarray(g.ext_ids)
    # eid i is the i-th edge of the fixture EDGES list (converter order)
    for k, eid in enumerate([0, 3]):
        s, d, t, w = EDGES[eid]
        assert int(ext[int(f.src[k])]) == s
        assert int(ext[int(f.dst[k])]) == d


def test_e_values_edge_features(toy):
    # e(edges).values(edge_feature) resolves through the frontier's eids
    # (reference: API_GET_P applies to edges too, get_feature_op.cc)
    g = toy
    eids = [1, 8, 10]
    out = Query(g).e(jnp.asarray(eids, jnp.int32)).values("edense").run(
        jax.random.PRNGKey(6))
    got = np.asarray(out["_value"]).ravel()
    want = [EDGES[e][3] * 10.0 for e in eids]
    np.testing.assert_allclose(got, want)


def test_sampleLNB_layer(toy):
    g = toy
    click = g.meta.edge_type_id("click")
    ids = jnp.asarray([_lid(g, 100), _lid(g, 102)], jnp.int32)
    out = (Query(g).v(ids).sampleLNB((click,), 4, 3)
           .run(jax.random.PRNGKey(7)))
    layer = np.asarray(out["_frontier"].ids)
    assert layer.shape == (3,)
    valid = layer[layer >= 0]
    allowed = {_lid(g, 101), _lid(g, 103)}
    assert set(valid.tolist()) <= allowed


def test_sparse_get_adj(toy):
    g = toy.tensors
    click = toy.meta.edge_type_id("click")
    nodes = jnp.asarray([_lid(toy, 100), _lid(toy, 104)], jnp.int32)
    nb = jnp.asarray([_lid(toy, 101), _lid(toy, 103), _lid(toy, 105)],
                     jnp.int32)
    conn, w = sampling.sparse_get_adj(g, nodes, nb, (click,))
    want = np.array([[1, 1, 0], [0, 0, 1]], bool)
    assert np.array_equal(np.asarray(conn), want)
    assert np.allclose(np.asarray(w)[0, :2], [1.0, 3.0])


def test_inflate_idx():
    # unique values [5,7,9]; idx = positions' unique slots
    idx = jnp.asarray([0, 1, 0, 2, 1, 0])
    out = np.asarray(util_ops.inflate_idx(idx))
    # counts [3,2,1]; starts [0,3,5]
    assert sorted(out.tolist()) == [0, 1, 2, 3, 4, 5]
    assert out[0] == 0 and out[2] == 1 and out[5] == 2   # value 0 slots
    assert out[1] == 3 and out[4] == 4                   # value 1 slots
    assert out[3] == 5                                   # value 2 slot


def test_unique_gather_matches_direct():
    """unique_gather (the flag-gated unique-before-gather rewrite) must
    reproduce the direct fetch row-for-row, including -1 pads and heavy
    duplication."""
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    ids = jnp.asarray(
        np.where(rng.random(64) < 0.15, -1,
                 rng.integers(0, 16, 64)).astype(np.int32))

    def fetch(x):
        return jnp.where((x >= 0)[:, None], tab[jnp.maximum(x, 0)], 0.0)

    got = np.asarray(util_ops.unique_gather(fetch, ids))
    np.testing.assert_allclose(got, np.asarray(fetch(ids)), rtol=1e-6)
    # all-duplicate and all-pad edge shapes
    for arr in ([3] * 8, [-1] * 8, [7]):
        a = jnp.asarray(arr, jnp.int32)
        np.testing.assert_allclose(
            np.asarray(util_ops.unique_gather(fetch, a)),
            np.asarray(fetch(a)), rtol=1e-6)


def test_gnn_dedup_features_parity(toy_graph):
    """GNNNet(dedup_features=True) must equal the direct path exactly
    for the same rngs (same params, same sample draws)."""
    import jax
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn
    g = toy_graph.tensors
    feat = encoders.ShallowEncoder(dense_names=("dense2",))
    kw = dict(conv="sage", flow=flows.SageDataFlow([3, 2], [(0, 1)] * 2),
              dims=(8, 8), feature=feat)
    roots = jnp.asarray([0, 3, 5, -1], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    base = gnn.GNNNet(**kw)
    dedup = gnn.GNNNet(dedup_features=True, **kw)
    params = base.init(rngs, g, roots)
    out_b = base.apply(params, g, roots, rngs={"sample": rngs["sample"]})
    out_d = dedup.apply(params, g, roots, rngs={"sample": rngs["sample"]})
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d),
                               rtol=1e-6)


def test_sparse_gather():
    ids = jnp.asarray([[1, 2, -1], [3, -1, -1], [4, 5, 6]])
    mask = ids >= 0
    rows, m = util_ops.sparse_gather(jnp.asarray([2, 0, -1]), ids, mask)
    assert np.array_equal(np.asarray(rows[0]), [4, 5, 6])
    assert np.array_equal(np.asarray(rows[1]), [1, 2, -1])
    assert not np.asarray(m[2]).any()


def test_registered_and_parameterized_udfs(toy_graph):
    """User-registered, parameterized, and inline-callable UDFs run
    through Query.run (reference UDF framework: udf.h:33,43 registry +
    parameterized Compute)."""
    from euler_tpu.query import Query, register_udf, udf

    g = toy_graph.tensors
    ids = jnp.asarray([0, 3, 5], jnp.int32)
    register_udf("test_pnorm", lambda x, p: jnp.sum(
        jnp.abs(x) ** p, axis=-1, keepdims=True) ** (1.0 / p))

    out = (Query(g).v(ids)
           .values(udf("test_pnorm", "dense2", 2.0)).alias("norm2")
           .values(udf(lambda x: x * 10.0, "dense2")).alias("x10")
           ).run(jax.random.PRNGKey(0))
    from euler_tpu.ops import feature_ops
    base = np.asarray(feature_ops.get_dense_feature(g, ids, ["dense2"])[0])
    np.testing.assert_allclose(np.asarray(out["norm2"]).reshape(-1),
                               np.linalg.norm(base, axis=-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["x10"]), base * 10.0,
                               rtol=1e-6)
    # unknown name rejected at build time
    import pytest
    with pytest.raises(KeyError):
        udf("never_registered", "dense2")


def test_registered_udf_under_mesh(toy_graph):
    """A registered UDF compiles inside shard_map (sharded feature
    gather feeds the same traced callable)."""
    from jax.sharding import PartitionSpec as P

    from euler_tpu.parallel import mesh as mesh_lib, sharded
    from euler_tpu.query import Query, register_udf, udf

    register_udf("test_rowsum", lambda x: jnp.sum(x, axis=-1,
                                                  keepdims=True))
    g = toy_graph.tensors
    ids = jnp.asarray([0, 3, 5, 7], jnp.int32)
    want = np.asarray((Query(g).v(ids)
                       .values(udf("test_rowsum", "dense2"))
                       ).run(jax.random.PRNGKey(0))["_value"])

    sg = sharded.build_sharded(toy_graph, 4)
    mesh = mesh_lib.make_mesh(data=2, graph=4)
    gspecs = sharded.shard_specs(sg)

    def body(sgb, key):
        view = sharded.to_view(sgb, "graph")
        return (Query(view).v(ids)
                .values(udf("test_rowsum", "dense2"))
                ).run(key, jit=False)["_value"]

    with mesh:
        got = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(gspecs, P()), out_specs=P(),
            check_vma=False))(sg, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got)[:4], want, rtol=1e-5)


def test_query_chain_under_mesh(toy_graph):
    """The compiled query plan runs unchanged inside shard_map: the
    verbs dispatch to their sharded implementations, replacing the
    reference's split/REMOTE/merge DAG rewriting (optimizer.h:49-86)."""
    from jax.sharding import PartitionSpec as P

    from euler_tpu.parallel import mesh as mesh_lib, sharded
    from euler_tpu.query import Query

    g = toy_graph.tensors
    et = g.meta.edge_types.index("click")
    ids = jnp.asarray([toy_graph.local_id(100), toy_graph.local_id(102)],
                      jnp.int32)

    def chain(graph_like, key):
        q = (Query(graph_like).v(ids)
             .sampleNB((et,), 8).alias("nb")
             .values("dense2").alias("f"))
        return q.run(key, jit=False)

    want = jax.jit(lambda g, k: chain(g, k))(g, jax.random.PRNGKey(4))

    sg = sharded.build_sharded(toy_graph, 4)
    mesh = mesh_lib.make_mesh(data=2, graph=4)
    gspecs = sharded.shard_specs(sg)

    def body(sgb, key):
        view = sharded.to_view(sgb, "graph")
        out = chain(view, key)
        return out["nb"].ids, out["f"]

    with mesh:
        nb_ids, feats = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(gspecs, P()), out_specs=P(),
            check_vma=False))(sg, jax.random.PRNGKey(4))
    nb_ids, feats = np.asarray(nb_ids)[:2], np.asarray(feats)

    # same neighbor SETS as single-chip (different RNG routing), and
    # features of the drawn neighbors match the single-chip tables
    legal0 = set(np.asarray(want["nb"].ids)[0][
        np.asarray(want["nb"].ids)[0] >= 0].tolist())
    drawn0 = set(nb_ids[0][nb_ids[0] >= 0].tolist())
    assert drawn0 and drawn0 <= legal0 | drawn0
    from euler_tpu.ops import feature_ops
    ref_feats = np.asarray(feature_ops.get_dense_feature(
        g, jnp.asarray(nb_ids.reshape(-1)), ["dense2"])[0])
    np.testing.assert_allclose(feats[:ref_feats.shape[0]], ref_feats,
                               rtol=1e-5)
