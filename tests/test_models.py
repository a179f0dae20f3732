"""Dataflow/conv/net tests (reference coverage:
tf_euler/python/convolution/conv_test.py + mp_utils usage in examples)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.dataflow import block as block_lib
from euler_tpu.dataflow import flows
from euler_tpu.models import convs, encoders, gnn
from euler_tpu.ops import mp_ops


def _blocks(toy_graph, batch=4, fanouts=(3, 2)):
    g = toy_graph.tensors
    flow = flows.SageDataFlow(list(fanouts), [(0, 1)] * len(fanouts))
    roots = jnp.asarray([0, 1, 2, 3], jnp.int32)
    return flow(g, jax.random.PRNGKey(0), roots), roots


def test_sage_dataflow_block_shapes(toy_graph):
    blocks, roots = _blocks(toy_graph)
    # deepest first: sizes (16, 48) then (4, 16)
    assert blocks[0].size == (16, 48)
    assert blocks[1].size == (4, 16)
    assert blocks[0].edge_index.shape == (2, 16 * 2 + 16)
    # block chaining: next block's source count == this block's target count
    assert blocks[0].size[0] == blocks[1].size[1]


def test_block_self_loops_and_masks(toy_graph):
    blocks, roots = _blocks(toy_graph)
    blk = blocks[1]
    ei = np.asarray(blk.edge_index)
    mask = np.asarray(blk.mask)
    n_id = np.asarray(blk.n_id)
    # last 4 edges are self loops of live roots
    assert (ei[0, -4:] == ei[1, -4:]).all()
    assert mask[-4:].sum() == 4
    # masked edges correspond to dead sampled neighbors
    dead = n_id[ei[1]] < 0
    assert (mask[dead] == 0).all()


def test_whole_dataflow(toy_graph):
    g = toy_graph.tensors
    flow = flows.WholeDataFlow(2, [(0, 1)], layout="edge_list")
    blocks = flow(g, jax.random.PRNGKey(0), jnp.arange(8, dtype=jnp.int32))
    assert len(blocks) == 2
    blk = blocks[0]
    assert blk.size == (8, 8)
    # 11 edges + 8 self loops
    assert blk.edge_index.shape == (2, 19)
    assert np.asarray(blk.mask).sum() == 19
    # auto layout picks the build-time ELL pack: regular [N, C] rows,
    # same edge population (11 real + 8 loops), transpose table carried
    blk2 = flows.WholeDataFlow(2, [(0, 1)])(g, jax.random.PRNGKey(0),
                                            jnp.arange(8, dtype=jnp.int32))[0]
    assert blk2.fanout == g.ell_nbr.shape[1]
    assert blk2.ell_tpos is not None and blk2.src_deg is not None
    assert np.asarray(blk2.mask).sum() == 19


def test_layerwise_dataflow_shapes(toy_graph):
    g = toy_graph.tensors
    flow = flows.LayerwiseDataFlow([6, 4], [(0, 1)] * 2)
    roots = jnp.asarray([0, 2], jnp.int32)
    blocks = flow(g, jax.random.PRNGKey(1), roots)
    assert blocks[1].size == (2, 2 + 6)
    assert blocks[0].size == (8, 8 + 4)


def test_layerwise_full_adjacency(toy_graph):
    """LADIES blocks carry the FULL frontier x layer adjacency, not just
    the provenance edge that drew each layer node (reference:
    local_sample_layer_op.cc:94-102 + sample_neighbor_layerwise_with_adj).
    Checked against a brute-force adjacency of the fixture edge list."""
    from tests.fixtures import EDGES
    g = toy_graph.tensors
    m = 5
    flow = flows.LayerwiseDataFlow([m], [(0, 1)], add_self_loops=False)
    roots = jnp.asarray(toy_graph.local_ids([100, 102, 104, 101]), jnp.int32)
    for seed in range(6):
        blocks = flow(g, jax.random.PRNGKey(seed), roots)
        blk = blocks[0]
        T = blk.size[0]
        n_id = np.asarray(blk.n_id)
        layer = n_id[T:]
        live = layer[layer >= 0]
        assert len(set(live.tolist())) == len(live)  # dedup'd layer
        ei = np.asarray(blk.edge_index)
        mask = np.asarray(blk.mask)
        w = np.asarray(blk.edge_weight)
        adj = {}
        for s, d, _, wt in EDGES:
            adj[(toy_graph.local_id(s), toy_graph.local_id(d))] = wt
        for e in range(ei.shape[1]):
            t, s = n_id[ei[0, e]], n_id[ei[1, e]]
            want = adj.get((int(t), int(s))) if t >= 0 and s >= 0 else None
            if want is None:
                assert mask[e] == 0, (t, s)
            else:
                assert mask[e] == 1, (t, s)
                assert w[e] == want


def test_shared_src_block_paths_match_generic(toy_graph):
    """The shared-source regular layout (gather/scatter via reshapes) must
    agree with the generic mp_ops gather/scatter path on the same block."""
    import dataclasses as dc
    g = toy_graph.tensors
    flow = flows.LayerwiseDataFlow([4], [(0, 1)])
    roots = jnp.asarray([0, 2, 4], jnp.int32)
    blk = flow(g, jax.random.PRNGKey(3), roots)[0]
    assert blk.shared_src
    gen = dc.replace(blk, fanout=None)
    key = jax.random.PRNGKey(7)
    x_src = jax.random.normal(key, (blk.size[1], 6))
    np.testing.assert_allclose(np.asarray(blk.gather_src(x_src)),
                               np.asarray(gen.gather_src(x_src)), rtol=1e-6)
    v = jax.random.normal(key, (blk.size[0], 6))
    np.testing.assert_allclose(np.asarray(blk.gather_tgt(v)),
                               np.asarray(gen.gather_tgt(v)), rtol=1e-6)
    upd = jax.random.normal(key, (blk.edge_index.shape[1], 6))
    for op in ("add", "mean", "max"):
        np.testing.assert_allclose(
            np.asarray(blk.scatter(op, upd, blk.mask)),
            np.asarray(gen.scatter(op, upd, blk.mask)), rtol=1e-5,
            atol=1e-6)
    scores = jax.random.normal(key, (blk.edge_index.shape[1],))
    np.testing.assert_allclose(np.asarray(blk.softmax(scores, blk.mask)),
                               np.asarray(gen.softmax(scores, blk.mask)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(blk.scatter_src_add(upd, blk.mask)),
        np.asarray(gen.scatter_src_add(upd, blk.mask)), rtol=1e-5,
        atol=1e-6)


def test_gnn_bf16_matches_f32(toy_graph):
    """Mixed-precision forward (dtype=bfloat16) stays close to f32 —
    params are f32, activations bf16 (the TPU training dtype)."""
    from euler_tpu.models import encoders, gnn
    g = toy_graph.tensors
    feat = encoders.ShallowEncoder(dense_names=("dense2",))
    roots = jnp.arange(8, dtype=jnp.int32)
    outs = {}
    for dt in (None, jnp.bfloat16):
        net = gnn.GNNNet(conv="sage",
                         flow=flows.SageDataFlow([4], [(0, 1)]),
                         dims=(16, 8), feature=feat, dtype=dt)
        rngs = {"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1)}
        params = net.init(rngs, g, roots)
        outs[dt] = np.asarray(
            net.apply(params, g, roots,
                      rngs={"sample": jax.random.PRNGKey(1)})
            .astype(jnp.float32))
    assert np.isfinite(outs[jnp.bfloat16]).all()
    np.testing.assert_allclose(outs[jnp.bfloat16], outs[None],
                               rtol=0.1, atol=0.05)


@pytest.mark.parametrize("name", ["gcn", "sage", "gat", "gin", "tag",
                                  "sgcn", "agnn", "appnp", "graph", "arma",
                                  "dna", "gated"])
def test_conv_forward_shapes(toy_graph, name):
    blocks, _ = _blocks(toy_graph)
    blk = blocks[0]
    D = 8
    x_src = jnp.ones((blk.size[1], D))
    x_tgt = x_src[: blk.size[0]]
    conv = convs.get_conv_class(name)(dim=D)
    params = conv.init(jax.random.PRNGKey(0), (x_tgt, x_src), blk)
    out = conv.apply(params, (x_tgt, x_src), blk)
    assert out.shape == (blk.size[0], D)
    assert np.isfinite(np.asarray(out)).all()


def test_relation_conv(toy_graph):
    blocks, _ = _blocks(toy_graph)
    blk = blocks[0]
    D = 8
    x_src = jnp.ones((blk.size[1], D))
    x_tgt = x_src[: blk.size[0]]
    edge_attr = jnp.zeros((blk.edge_index.shape[1],), jnp.int32)
    conv = convs.RelationConv(dim=D, num_relations=2)
    params = conv.init(jax.random.PRNGKey(0), (x_tgt, x_src), blk,
                       edge_attr=edge_attr)
    out = conv.apply(params, (x_tgt, x_src), blk, edge_attr=edge_attr)
    assert out.shape == (blk.size[0], D)


def test_gcn_conv_masked_edges_are_inert(toy_graph):
    """Padded edges must not affect output."""
    blocks, _ = _blocks(toy_graph)
    blk = blocks[1]
    D = 4
    x_src = jax.random.normal(jax.random.PRNGKey(1), (blk.size[1], D))
    x_tgt = x_src[: blk.size[0]]
    conv = convs.GCNConv(dim=D)
    params = conv.init(jax.random.PRNGKey(0), (x_tgt, x_src), blk)
    out1 = conv.apply(params, (x_tgt, x_src), blk)
    # poison the features of masked-out (dead) source nodes
    dead_src = np.asarray(blk.n_id) < 0
    x2 = jnp.where(jnp.asarray(dead_src)[:, None], 1e6, x_src)
    out2 = conv.apply(params, (x2[: blk.size[0]], x2), blk)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4)


def test_gnn_net_end_to_end(toy_graph):
    g = toy_graph.tensors
    feat = encoders.ShallowEncoder(dense_names=("dense2",))
    net = gnn.GNNNet(
        conv="sage",
        flow=flows.SageDataFlow([3, 2], [(0, 1)] * 2),
        dims=(16, 8),
        feature=feat)
    roots = jnp.asarray([0, 1, 2, 3], jnp.int32)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, g, roots)
    out = net.apply(params, g, roots, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.shape == (4, 8)


def test_supervise_model_loss_decreases(toy_graph):
    import optax
    g = toy_graph.tensors
    feat = encoders.ShallowEncoder(dense_names=("dense2", "price"))
    net = gnn.GNNNet(conv="gcn", flow=flows.WholeDataFlow(2, [(0, 1)]),
                     dims=(16, 16), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name="price", label_dim=1)
    roots = jnp.arange(8, dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, g, roots)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            out = model.apply(p, g, roots, rngs={"sample": key})
            return out["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_unsupervise_model(toy_graph):
    g = toy_graph.tensors
    emb = gnn.EmbedOnly(max_id=7, dim=8)
    ctx = gnn.EmbedOnly(max_id=7, dim=8)
    model = gnn.UnsuperviseModel(embedder=emb, context_embedder=ctx,
                                 edge_types=(0, 1), num_negs=5)
    roots = jnp.asarray([0, 2, 4], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, g, roots)
    out = model.apply(params, g, roots, rngs={"sample": jax.random.PRNGKey(2)})
    assert out["logits"].shape == (3, 1)
    assert out["neg_logits"].shape == (3, 5)
    assert np.isfinite(float(out["loss"]))


def test_metrics():
    import jax.numpy as jnp

    from euler_tpu.utils import metrics
    # mrr/hits
    pos = jnp.asarray([[2.0], [0.0]])
    neg = jnp.asarray([[1.0, 0.5, 3.0], [1.0, 2.0, 3.0]])
    np.testing.assert_allclose(float(metrics.mrr(pos, neg)),
                               (1 / 2 + 1 / 4) / 2)
    np.testing.assert_allclose(float(metrics.mean_rank(pos, neg)), 3.0)
    np.testing.assert_allclose(float(metrics.hit_at_k(pos, neg, 3)), 0.5)
    # f1
    lab = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    pred = jnp.asarray([[0.9, 0.2], [0.1, 0.8]])
    f1 = float(metrics.f1_score(lab, pred))
    # tp=2 ((0,0),(1,1)); fp=0; fn=1 ((1,0))
    np.testing.assert_allclose(f1, 2 * 2 / (2 * 2 + 0 + 1))
    # auc perfect separation
    assert float(metrics.auc(jnp.asarray([1, 1, 0, 0]),
                             jnp.asarray([0.9, 0.8, 0.2, 0.1]))) == 1.0


def test_whole_ell_matches_edge_list_whole(toy_graph):
    """The whole-graph ELL layouts — build-time pack AND per-call
    dynamic assembly (cap >= max_degree) — must produce EXACTLY the
    same 2-layer forward as the edge-list whole-graph block, for the
    same params, for both a sym-norm conv (gcn: exercises src_deg) and
    a masked-mean conv (sage). The pack path's parameter GRADIENTS must
    match too (pins ell_expand's transpose-gather custom vjp)."""
    import numpy as np
    g = toy_graph.tensors
    assert g.ell_nbr is not None           # ALL_PACKS builds the pack
    gp = np.asarray(g.group_ptr)
    max_deg = int((gp[1:] - gp[:-1]).reshape(-1, 2).sum(1).max())
    g_nopack = g.replace(ell_nbr=None, ell_w=None, ell_eid=None,
                         ell_ty=None, ell_tpos=None, ell_in_deg=None)
    feat = encoders.ShallowEncoder(dense_names=("dense2",))
    roots = jnp.arange(8, dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    for conv in ("gcn", "sage"):
        mk = lambda **kw: gnn.GNNNet(
            conv=conv, flow=flows.WholeDataFlow(2, [(0, 1)], **kw),
            dims=(16, 8), feature=feat)
        base = mk(layout="edge_list")
        params = base.init(rngs, g, roots)

        def out_and_grad(net, graph):
            def loss(p):
                o = net.apply(p, graph, roots,
                              rngs={"sample": jax.random.PRNGKey(2)})
                return jnp.sum(o * o), o
            (l, o), gr = jax.value_and_grad(loss, has_aux=True)(params)
            return np.asarray(o), gr

        want, gw = out_and_grad(base, g)
        got_pack, gp_ = out_and_grad(mk(), g)            # auto -> pack
        got_dyn, _ = out_and_grad(mk(cap=max_deg), g_nopack)  # dynamic
        np.testing.assert_allclose(got_pack, want, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(got_dyn, want, rtol=2e-5, atol=2e-6)
        for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gp_)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)
