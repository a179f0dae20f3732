"""Multi-device SPMD tests on the 8-device virtual CPU mesh
(SURVEY.md §4: replaces the reference's forked-gRPC end2end tests,
euler/client/end2end_test.cc:54-93)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from euler_tpu.ops import sampling
from euler_tpu.parallel import mesh as mesh_lib
from euler_tpu.parallel import sharded, train
from tests import fixtures


@pytest.fixture(scope="module")
def sg4(toy_graph):
    return sharded.build_sharded(toy_graph, 4)


@pytest.fixture(scope="module")
def mesh24():
    return mesh_lib.make_mesh(data=2, graph=4)


def _run_sharded(mesh, sg, fn, *args):
    """shard_map a view-consuming fn; extra args replicated."""
    gspecs = sharded.shard_specs(sg)

    def body(sg_block, *a):
        view = sharded.to_view(sg_block, "graph")
        return fn(view, *a)

    with mesh:
        return jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(gspecs,) + (P(),) * len(args),
            out_specs=P(), check_vma=False))(sg, *args)


def test_build_sharded_shapes(toy_graph, sg4):
    assert sg4.node_type.shape == (4, 2)  # 8 nodes / 4 shards
    assert sg4.group_ptr.shape == (4, 2 * 2 + 1)
    # total edge weight preserved
    assert float(np.asarray(sg4.adj_w).sum()) == pytest.approx(
        sum(w for *_, w in fixtures.EDGES))
    # per-shard node weight sums: shard s owns local ids {s, s+4}
    w = np.asarray(sg4.shard_node_w)
    assert w.sum() == pytest.approx(36.0)


def test_sharded_dense_feature_matches_single(toy_graph, sg4, mesh24):
    g = toy_graph.tensors
    nodes = jnp.asarray([0, 3, 5, -1, 7, 2, 1, 6], jnp.int32)

    from euler_tpu.ops import feature_ops
    want = np.asarray(feature_ops.get_dense_feature(g, nodes, ["dense2"])[0])

    def fn(view, nodes):
        # nodes replicated: every device queries the same list; with
        # all_gather+slice semantics each device gets the full answer for
        # its own slice of the gathered list — to check the full list,
        # query it on every device and gather results
        return feature_ops.get_dense_feature(view, nodes, ["dense2"])[0]

    got = _run_sharded(mesh24, sg4, fn, nodes)
    # out_specs P() means results from device 0's slice...; easier: compare
    # values where defined
    assert got.shape[-1] == 2
    np.testing.assert_allclose(np.asarray(got)[:8], want, rtol=1e-6)


def test_sharded_node_type_matches(toy_graph, sg4, mesh24):
    g = toy_graph.tensors
    nodes = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)
    want = np.asarray(sampling.get_node_type(g, nodes))

    def fn(view, nodes):
        return sampling.get_node_type(view, nodes)

    got = np.asarray(_run_sharded(mesh24, sg4, fn, nodes))[:8]
    np.testing.assert_array_equal(got, want)


def test_sharded_sample_neighbor_distribution(toy_graph, sg4, mesh24):
    # node 100 (local 0), click: nbrs 101 (w1), 103 (w3)
    et = toy_graph.meta.edge_types.index("click")
    nodes = jnp.full((512,), toy_graph.local_id(100), jnp.int32)

    def fn(view, nodes, key):
        nbr, w, ty, eid = sampling.sample_neighbor(view, key, nodes, (et,),
                                                   8)
        return nbr

    got = np.asarray(_run_sharded(mesh24, sg4, fn, nodes,
                                  jax.random.PRNGKey(0)))
    got = got.reshape(-1)
    got = got[got >= 0]
    exts = toy_graph.ext_ids[got]
    assert set(exts.tolist()) <= {101, 103}
    np.testing.assert_allclose((exts == 103).mean(), 0.75, atol=0.03)


def test_sharded_fast_path_distribution(toy_graph, sg4, mesh24):
    # the ids-only fan_pack fast path must reproduce the weighted
    # distribution under the mesh (sharded mirror of sample_neighbor_fast)
    assert sg4.fan_pack is not None
    et = toy_graph.meta.edge_types.index("click")
    nodes = jnp.full((512,), toy_graph.local_id(100), jnp.int32)

    def fn(view, nodes, key):
        ids, valid = sampling.sample_neighbor_fast(view, key, nodes,
                                                   (et,), 8)
        return ids, valid.astype(jnp.int32)

    ids, valid = _run_sharded(mesh24, sg4, fn, nodes, jax.random.PRNGKey(2))
    ids, valid = np.asarray(ids).reshape(-1), np.asarray(valid).reshape(-1)
    assert (valid > 0).all()            # node 100 has click neighbors
    exts = toy_graph.ext_ids[ids]
    assert set(exts.tolist()) <= {101, 103}
    np.testing.assert_allclose((exts == 103).mean(), 0.75, atol=0.03)


def test_sharded_fast_path_multi_type(toy_graph, sg4, mesh24):
    # both edge types: 100 -> click {101 w1, 103 w3} + buy {105 w2}
    ets = (0, 1)
    nodes = jnp.full((512,), toy_graph.local_id(100), jnp.int32)

    def fn(view, nodes, key):
        return sampling.sample_neighbor_fast(view, key, nodes, ets, 8)[0]

    got = np.asarray(_run_sharded(mesh24, sg4, fn, nodes,
                                  jax.random.PRNGKey(7))).reshape(-1)
    exts = toy_graph.ext_ids[got[got >= 0]]
    freq = {e: (exts == e).mean() for e in (101, 103, 105)}
    np.testing.assert_allclose([freq[101], freq[103], freq[105]],
                               np.array([1, 3, 2]) / 6, atol=0.03)


def test_sharded_sample_node_distribution(toy_graph, sg4, mesh24):
    def fn(view, key):
        return sampling.sample_node(view, key, 4096, -1)

    got = np.asarray(_run_sharded(mesh24, sg4, fn, jax.random.PRNGKey(1)))
    assert got.min() >= 0 and got.max() <= 7
    freq = np.bincount(got, minlength=8) / len(got)
    np.testing.assert_allclose(freq, np.arange(1, 9) / 36, atol=0.03)


def test_sharded_sample_edge(toy_graph, sg4, mesh24):
    def fn(view, key):
        src, dst, ty, eid = sampling.sample_edge(view, key, 2048, -1)
        return jnp.stack([src, dst, ty, eid], 1)

    got = np.asarray(_run_sharded(mesh24, sg4, fn, jax.random.PRNGKey(2)))
    assert (got[:, 0] >= 0).all()
    for s, d, t, e in got[:100]:
        es, ed, _, _ = fixtures.EDGES[e]
        assert toy_graph.ext_ids[s] == es and toy_graph.ext_ids[d] == ed


def test_sharded_end_to_end_train_step(tmp_path):
    """Full GraphSAGE train step over (data=2, graph=4): compiles, runs,
    loss decreases."""
    import optax

    from euler_tpu.datasets.synthetic import SBMDataset
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn

    ds = SBMDataset(str(tmp_path), n_nodes=160, n_classes=3, feat_dim=8,
                    seed=5)
    graph = ds.load_graph()
    sg = sharded.build_sharded(graph, 4)
    mesh = mesh_lib.make_mesh(data=2, graph=4)
    sg = train.place_sharded_graph(sg, mesh)

    et = graph.meta.edge_types.index("link")
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = gnn.GNNNet(conv="sage", flow=flows.SageDataFlow([4, 4],
                                                          [(et,), (et,)]),
                     dims=(16, 16), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                               label_dim=ds.label_dim)
    tx = optax.adam(0.02)
    params = train.init_sharded_params(model, sg, mesh, 16)
    step = train.make_sharded_train_step(model, sg, tx, mesh, 16)
    opt_state = tx.init(params)
    losses = []
    with mesh:
        for i in range(25):
            params, opt_state, loss = step(params, opt_state, sg,
                                           jax.random.PRNGKey(i))
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses


# ---------------------------------------------------------------------------
# round-3 verb parity: sharded output == single-chip output on the toy graph
# (VERDICT.md #2: every verb sharded-correct or loudly unimplemented)
# ---------------------------------------------------------------------------

ALL_NODES = list(range(8))


def test_sharded_full_neighbor_matches(toy_graph, sg4, mesh24):
    g = toy_graph.tensors
    ets = tuple(range(len(toy_graph.meta.edge_types)))
    nodes = jnp.asarray(ALL_NODES + [-1], jnp.int32)
    want = [np.asarray(x) for x in sampling.get_full_neighbor(
        g, nodes, ets, 6, sorted_by_id=True)]

    def fn(view, nodes):
        nbr, w, ty, eid, ok = sampling.get_full_neighbor(
            view, nodes, ets, 6, sorted_by_id=True)
        return nbr, w, ty, eid, ok

    got = [np.asarray(x)[:9] for x in
           _run_sharded(mesh24, sg4, fn, nodes)]
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_sharded_top_k_neighbor_matches(toy_graph, sg4, mesh24):
    g = toy_graph.tensors
    ets = tuple(range(len(toy_graph.meta.edge_types)))
    nodes = jnp.asarray(ALL_NODES, jnp.int32)
    want = [np.asarray(x) for x in sampling.get_top_k_neighbor(
        g, nodes, ets, 2)]

    def fn(view, nodes):
        return sampling.get_top_k_neighbor(view, nodes, ets, 2)

    got = [np.asarray(x)[:8] for x in _run_sharded(mesh24, sg4, fn, nodes)]
    # top-k by weight can tie; compare weights exactly, ids as sets per row
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6)
    np.testing.assert_array_equal(got[4], want[4])
    for r in range(8):
        assert set(got[0][r]) == set(want[0][r])


def test_sharded_sparse_get_adj_matches(toy_graph, sg4, mesh24):
    g = toy_graph.tensors
    ets = tuple(range(len(toy_graph.meta.edge_types)))
    nodes = jnp.asarray(ALL_NODES, jnp.int32)
    nb = jnp.asarray([1, 3, 5, 0, 7, -1], jnp.int32)
    want_c, want_w = (np.asarray(x)
                      for x in sampling.sparse_get_adj(g, nodes, nb, ets))

    def fn(view, nodes, nb):
        return sampling.sparse_get_adj(view, nodes, nb, ets)

    got_c, got_w = (np.asarray(x)[:8]
                    for x in _run_sharded(mesh24, sg4, fn, nodes, nb))
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_allclose(got_w, want_w, rtol=1e-6)


def test_sharded_sample_node_with_src(toy_graph, sg4, mesh24):
    g = toy_graph.tensors
    src = jnp.asarray(ALL_NODES, jnp.int32)

    def fn(view, src, key):
        return sampling.sample_node_with_src(view, key, src, 16)

    got = np.asarray(_run_sharded(mesh24, sg4, fn, src,
                                  jax.random.PRNGKey(3)))[:8]
    assert (got >= 0).all()
    want_t = np.asarray(g.node_type)
    got_t = want_t[got]
    np.testing.assert_array_equal(got_t, np.broadcast_to(
        want_t[np.asarray(src)][:, None], got.shape))


def test_sharded_edge_features_and_type(toy_graph, sg4, mesh24):
    from euler_tpu.ops import feature_ops
    g = toy_graph.tensors
    eids = jnp.asarray([0, 3, 7, 10, -1, 5], jnp.int32)
    want_d = np.asarray(
        feature_ops.get_edge_dense_feature(g, eids, ["edense"])[0])
    want_sp, want_m = (np.asarray(x) for x in
                       feature_ops.get_edge_sparse_feature(
                           g, eids, ["esparse"])[0])
    want_t = np.asarray(feature_ops.get_edge_type(g, eids))

    def fn(view, eids):
        d = feature_ops.get_edge_dense_feature(view, eids, ["edense"])[0]
        sp, m = feature_ops.get_edge_sparse_feature(view, eids,
                                                    ["esparse"])[0]
        t = feature_ops.get_edge_type(view, eids)
        return d, sp, m, t

    d, sp, m, t = (np.asarray(x)[:6]
                   for x in _run_sharded(mesh24, sg4, fn, eids))
    np.testing.assert_allclose(d, want_d, rtol=1e-6)
    np.testing.assert_array_equal(sp, want_sp)
    np.testing.assert_array_equal(m, want_m)
    np.testing.assert_array_equal(t, want_t)


def test_sharded_index_ops(toy_graph, sg4, mesh24):
    from euler_tpu.ops import index as index_ops
    g = toy_graph.tensors
    dnf = [[index_ops.Pred("price", "gt", 5.0)]]
    want_ids, want_m = (np.asarray(x) for x in
                        index_ops.query_index_ids(g, dnf, 8))

    def fn_ids(view):
        return index_ops.query_index_ids(view, dnf, 8)

    ids, m = (np.asarray(x) for x in _run_sharded(mesh24, sg4, fn_ids))
    assert set(ids[ids >= 0]) == set(want_ids[want_ids >= 0])

    def fn_cond(view, key):
        return index_ops.sample_node_with_condition(view, key, 256, dnf)

    got = np.asarray(_run_sharded(mesh24, sg4, fn_cond,
                                  jax.random.PRNGKey(4)))
    assert (got >= 0).all()
    assert set(got.tolist()) <= set(want_ids[want_ids >= 0].tolist())
    # weighted: node weights are i+1
    freq = np.bincount(got, minlength=8)[ids[ids >= 0]]
    assert freq.sum() == 256


def test_sharded_biased_walk_and_layer(toy_graph, sg4, mesh24):
    from euler_tpu.ops import walk as walk_ops
    ets = tuple(range(len(toy_graph.meta.edge_types)))
    nodes = jnp.asarray(ALL_NODES, jnp.int32)

    def fn_walk(view, nodes, key):
        return walk_ops.random_walk(view, key, nodes, ets, 3, p=0.5, q=2.0)

    paths = np.asarray(_run_sharded(mesh24, sg4, fn_walk, nodes,
                                    jax.random.PRNGKey(5)))[:8]
    # every consecutive (valid) pair must be a real edge
    g = toy_graph.tensors
    edge_set = {(int(s), int(d)) for s, d in
                zip(np.asarray(g.adj_src), np.asarray(g.adj_dst))}
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in edge_set

    def fn_layer(view, nodes, key):
        return sampling.sample_layer(view, key, nodes, ets, 4, 8)

    ids, w = (np.asarray(x) for x in _run_sharded(
        mesh24, sg4, fn_layer, nodes, jax.random.PRNGKey(6)))
    valid = ids[ids >= 0]
    all_dst = set(np.asarray(g.adj_dst).tolist())
    assert set(valid.tolist()) <= all_dst


def test_sharded_graph_label_requires_members(toy_graph, sg4, mesh24):
    # toy graph has no 'graph_label' feature -> clear error, not a crash
    def fn(view, key):
        return sampling.sample_graph_label(view, key, 4)

    with pytest.raises(ValueError, match="graph_label"):
        _run_sharded(mesh24, sg4, fn, jax.random.PRNGKey(0))


def test_sharded_graph_label_parity(tmp_path_factory):
    """Replicated membership table: graph-label verbs under the mesh give
    the single-chip answers (reference: get_graph_by_label_op.cc)."""
    from euler_tpu.datasets.synthetic import MotifDataset
    d = tmp_path_factory.mktemp("motif_sh")
    ds = MotifDataset(str(d), n_graphs=12, seed=0)
    graph = ds.load_graph()
    g = graph.tensors
    sg = sharded.build_sharded(graph, 4)
    assert sg.graph_members is not None
    mesh = mesh_lib.make_mesh(data=2, graph=4)
    gidx = jnp.asarray([0, 3, 7, 11], jnp.int32)

    want = [np.asarray(x) for x in sampling.get_graph_by_label(g, gidx)]

    def fn(view, gidx, key):
        members, mask, nid = sampling.get_graph_by_label(view, gidx)
        lab = sampling.sample_graph_label(view, key, 4)
        return members, mask, nid, lab

    members, mask, nid, lab = _run_sharded(
        mesh, sg, fn, gidx, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(members), want[0])
    np.testing.assert_array_equal(np.asarray(mask), want[1])
    np.testing.assert_array_equal(np.asarray(nid), want[2])
    lab = np.asarray(lab)
    assert ((lab >= 0) & (lab < 12)).all()


def test_sharded_in_neighbor_parity(toy_graph, sg4, mesh24):
    """Sharded in-neighbor verbs vs the single-chip in-CSR
    (reference: node.h:87-112 served by the dst shard)."""
    g = toy_graph.tensors
    assert sg4.in_group_ptr is not None
    ets = (0, 1)
    nodes = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)

    want = [np.asarray(x) for x in sampling.get_full_in_neighbor(
        g, nodes, ets, cap=8, sorted_by_id=True)]

    def fn_full(view, nodes):
        return sampling.get_full_in_neighbor(view, nodes, ets, cap=8,
                                             sorted_by_id=True)

    got = [np.asarray(x)[:8] for x in _run_sharded(mesh24, sg4, fn_full,
                                                   nodes)]
    np.testing.assert_array_equal(got[0], want[0])   # neighbor ids
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6)   # weights
    np.testing.assert_array_equal(got[3], want[3])   # eids
    np.testing.assert_array_equal(got[4], want[4])   # mask

    # weighted sampling: every draw must be a true in-neighbor, and the
    # empirical distribution must match the in-group weights
    def fn_samp(view, nodes, key):
        return sampling.sample_in_neighbor(view, key, nodes, ets, 2000)

    nbr, w, ty, eid = (np.asarray(x)[:8] for x in _run_sharded(
        mesh24, sg4, fn_samp, nodes, jax.random.PRNGKey(3)))
    in_sets = {}
    for i, (s, d, et, ww) in enumerate(fixtures.EDGES):
        in_sets.setdefault(int(toy_graph.local_id(d)), set()).add(
            int(toy_graph.local_id(s)))
    for i in range(8):
        drawn = set(nbr[i][nbr[i] >= 0].tolist())
        assert drawn <= in_sets.get(i, set()), (i, drawn, in_sets.get(i))


def test_owner_compute_sampling_parity(toy_graph, sg4, mesh24):
    """Owner-compute compaction (O(b) per-shard gathers, VERDICT r3 #4)
    must reproduce the full-spread path's results: identical valid
    masks, every drawn id a true neighbor, and features equal."""
    from euler_tpu.ops import feature_ops
    g = toy_graph.tensors
    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.integers(0, 8, 64), jnp.int32)
    et = (g.meta.edge_types.index("click"),)

    def fn(view, nodes, key):
        ids, valid = sampling.sample_neighbor_fast(view, key, nodes, et,
                                                   16)
        feat = feature_ops.get_dense_feature(view, nodes, ["dense2"])[0]
        nbr, w, ty, eid = sampling.sample_neighbor(view, key, nodes, et,
                                                   8)
        sp, spm = feature_ops.get_sparse_feature(view, nodes,
                                                 ["sparse_ids"])[0]
        nt = sampling.get_node_type(view, nodes)
        return ids, valid, feat, nbr, w, ty, eid, sp, nt

    try:
        sharded.set_owner_compute(False)
        ref = [np.asarray(x)[:64] for x in _run_sharded(
            mesh24, sg4, fn, nodes, jax.random.PRNGKey(3))]
        sharded.set_owner_compute(True)
        got = [np.asarray(x)[:64] for x in _run_sharded(
            mesh24, sg4, fn, nodes, jax.random.PRNGKey(3))]
    finally:
        sharded.set_owner_compute(None)

    # valid masks identical (capacity 4*64=256 = S*b, nothing dropped)
    np.testing.assert_array_equal(got[1], ref[1])
    np.testing.assert_allclose(got[2], ref[2], rtol=1e-6)
    # payload verb: same per-row validity + weights where drawn equal
    np.testing.assert_array_equal(got[5] >= 0, ref[5] >= 0)   # types
    np.testing.assert_array_equal(got[8], ref[8])             # node types
    np.testing.assert_array_equal(got[7], ref[7])             # sparse ids
    # sampled ids: both paths draw from the true out-neighbor sets
    out_sets = {}
    for s, d, _t, _w in fixtures.EDGES:
        if _t == "click":
            out_sets.setdefault(int(toy_graph.local_id(s)), set()).add(
                int(toy_graph.local_id(d)))
    nn = np.asarray(nodes)
    for i in range(64):
        drawn = set(got[0][i][got[1][i]].tolist())
        assert drawn <= out_sets.get(int(nn[i]), set())


def test_owner_compute_hub_duplicates_fully_served(toy_graph, sg4,
                                                   mesh24):
    """Duplicate-id skew must NOT overflow the owner buffer (r4 advisor
    medium): a hub id repeated in every query collapses to one slot via
    the dedup compaction, so all rows are answered — before the dedup
    this exact shape silently returned valid=False / zero features for
    most rows."""
    nodes = jnp.zeros((64,), jnp.int32)   # every root owned by shard 0
    et = (toy_graph.meta.edge_types.index("click"),)

    def fn(view, nodes, key):
        from euler_tpu.ops import feature_ops
        ids, valid = sampling.sample_neighbor_fast(view, key, nodes, et, 4)
        feat = feature_ops.get_dense_feature(view, nodes, ["dense2"])[0]
        return ids, valid, feat

    try:
        sharded.set_owner_compute(True)
        ids, valid, feat = (np.asarray(x)[:64] for x in _run_sharded(
            mesh24, sg4, fn, nodes, jax.random.PRNGKey(4)))
    finally:
        sharded.set_owner_compute(None)
    # every duplicate row is served: valid ids drawn from node 0's true
    # neighbor set, and feature rows match the single-chip answer
    assert valid.all()
    legal = {int(toy_graph.local_id(d)) for s, d, t, w in fixtures.EDGES
             if t == "click" and s == 100}
    assert set(ids.reshape(-1).tolist()) <= legal
    from euler_tpu.ops import feature_ops
    want = np.asarray(feature_ops.get_dense_feature(
        toy_graph.tensors, nodes, ["dense2"])[0])
    np.testing.assert_allclose(feat, want, rtol=1e-6)


def test_owner_compute_hub_mixed_batch_parity(toy_graph, sg4, mesh24):
    """The advisor's repro shape: a mixed batch where one hub id fills
    most rows. With dedup compaction the compact path must equal the
    exact full-spread path row-for-row on features/validity."""
    from euler_tpu.ops import feature_ops
    rng = np.random.default_rng(7)
    nodes = np.where(rng.random(64) < 0.9, 0,
                     rng.integers(0, 8, 64)).astype(np.int32)
    nodes = jnp.asarray(nodes)
    et = (toy_graph.meta.edge_types.index("click"),)

    def fn(view, nodes, key):
        ids, valid = sampling.sample_neighbor_fast(view, key, nodes, et, 4)
        feat = feature_ops.get_dense_feature(view, nodes, ["dense2"])[0]
        nt = sampling.get_node_type(view, nodes)
        return ids, valid, feat, nt

    try:
        sharded.set_owner_compute(False)
        ref = [np.asarray(x)[:64] for x in _run_sharded(
            mesh24, sg4, fn, nodes, jax.random.PRNGKey(5))]
        sharded.set_owner_compute(True)
        got = [np.asarray(x)[:64] for x in _run_sharded(
            mesh24, sg4, fn, nodes, jax.random.PRNGKey(5))]
    finally:
        sharded.set_owner_compute(None)
    np.testing.assert_array_equal(got[1], ref[1])        # valid masks
    np.testing.assert_allclose(got[2], ref[2], rtol=1e-6)  # features
    np.testing.assert_array_equal(got[3], ref[3])        # node types


def test_whole_flow_under_mesh_matches_single(toy_graph, sg4, mesh24):
    """WholeDataFlow under the mesh: each shard aggregates its LOCAL
    edges over the global node space and completes with psum
    (Block.psum_axis) — the distributed SpMM. Deterministic, so the
    2-layer GCN forward must match the single-chip whole block
    exactly."""
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn
    g = toy_graph.tensors
    feat = encoders.ShallowEncoder(dense_names=("dense2",))
    net = gnn.GNNNet(conv="gcn",
                     flow=flows.WholeDataFlow(2, [(0, 1)],
                                              layout="edge_list"),
                     dims=(8, 4), feature=feat)
    roots = jnp.asarray([0, 3, 5, 7, -1], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    params = net.init(rngs, g, roots)
    want = np.asarray(net.apply(params, g, roots,
                                rngs={"sample": jax.random.PRNGKey(2)}))

    gspecs = sharded.shard_specs(sg4)

    def body(sgb, p, key):
        view = sharded.to_view(sgb, "graph")
        return net.apply(p, view, roots, rngs={"sample": key})

    from jax.sharding import PartitionSpec as P
    with mesh24:
        got = jax.jit(jax.shard_map(
            body, mesh=mesh24, in_specs=(gspecs, P(), P()),
            out_specs=P(), check_vma=False))(
            sg4, params, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(got)[:5], want, rtol=2e-4,
                               atol=2e-5)


def test_sharded_union_fan_typed_draws(toy_graph, sg4, mesh24):
    """Multi-type typed draws under the mesh ride the UNION fan rows
    (one gather + lane decode, like the single-chip fanu path): ids and
    types legal per the fixture, union-weighted distribution, -1 types
    exactly on invalid draws."""
    assert sg4.fanu_pack is not None
    ets = (0, 1)
    nodes = jnp.asarray(
        [toy_graph.local_id(100)] * 510
        + [toy_graph.local_id(107), -1], jnp.int32)

    def fn(view, nodes, key):
        ids, valid, ty = sampling.sample_neighbor_fast(
            view, key, nodes, ets, 8, return_types=True)
        return ids, valid.astype(jnp.int32), ty

    ids, valid, ty = (np.asarray(x)[:512] for x in _run_sharded(
        mesh24, sg4, fn, nodes, jax.random.PRNGKey(11)))
    assert (valid[:510] > 0).all()
    assert not valid[510].any() and not valid[511].any()
    assert ((ty == -1) == (valid == 0)).all()
    names = toy_graph.meta.edge_types
    legal = {(d, t) for s, d, t, w in fixtures.EDGES if s == 100}
    exts = toy_graph.ext_ids[np.maximum(ids[:510], 0)]
    pairs = {(int(e), names[int(t)])
             for e, t in zip(exts.reshape(-1), ty[:510].reshape(-1))}
    assert pairs <= legal
    # union weights: click 101 w1, 103 w3; buy 105 w2 -> buy freq 2/6
    np.testing.assert_allclose(
        (ty[:510] == toy_graph.meta.edge_types.index("buy")).mean(),
        2 / 6, atol=0.03)
