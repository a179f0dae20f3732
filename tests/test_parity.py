"""Golden-value conv parity tests.

Hand-computed expected outputs under the reference's EXACT semantics
(reference: tf_euler/python/convolution/gcn_conv.py:26-54 sym-norm,
sage_conv.py:26-44 mean aggregation, gat_conv.py:41-75 leaky-relu(0.2)
attention + scatter_softmax, gin_conv.py (1+eps)x + sum; test model
tf_euler/python/convolution/conv_test.py and graph_test.cc:92-140).

The expected values are re-derived in numpy from the reference formulas —
any semantics drift in a conv (normalization, masking, aggregation order,
activation constants) fails these, where shape tests would not.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.dataflow.block import Block
from euler_tpu.models import convs

# Fixed bipartite block: 3 targets, 5 sources (targets are sources 0..2),
# 6 real edges + 1 padded edge (mask 0). edge_index rows: [dst, src].
DST = np.array([0, 0, 1, 1, 2, 2, 2], np.int32)
SRC = np.array([3, 4, 0, 3, 1, 4, 2], np.int32)
MASK = np.array([1, 1, 1, 1, 1, 1, 0], np.float32)
T, S, D = 3, 5, 2

RNG = np.random.default_rng(7)
X = RNG.normal(size=(S, D)).astype(np.float32)
W1 = RNG.normal(size=(D, D)).astype(np.float32)
W2 = RNG.normal(size=(D, D)).astype(np.float32)
A1 = RNG.normal(size=(D, 1)).astype(np.float32)
A2 = RNG.normal(size=(D, 1)).astype(np.float32)


def _block():
    return Block(
        n_id=jnp.arange(S, dtype=jnp.int32),
        res_n_id=jnp.arange(T, dtype=jnp.int32),
        edge_index=jnp.asarray(np.stack([DST, SRC])),
        e_id=jnp.full((len(DST),), -1, jnp.int32),
        edge_weight=jnp.ones((len(DST),), jnp.float32),
        mask=jnp.asarray(MASK),
        size=(T, S),
    )


def _apply(conv, params):
    blk = _block()
    x = jnp.asarray(X)
    return np.asarray(conv.apply(params, (x[:T], x), blk))


def _edges():
    return [(d, s) for d, s, m in zip(DST, SRC, MASK) if m > 0]


def test_gcn_golden():
    conv = convs.GCNConv(dim=D)
    params = {"params": {"Dense_0": {"kernel": jnp.asarray(W1)}}}
    # reference gcn_conv.py:33-46: deg from scatter_add of ones over real
    # edges on each side, out = fc(sum_j deg_i^-.5 deg_j^-.5 x_j)
    deg_t = np.zeros(T)
    deg_s = np.zeros(S)
    for d, s in _edges():
        deg_t[d] += 1
        deg_s[s] += 1
    ni = np.where(deg_t > 0, deg_t, 1.0) ** -0.5
    nj = np.where(deg_s > 0, deg_s, 1.0) ** -0.5
    aggr = np.zeros((T, D))
    for d, s in _edges():
        aggr[d] += ni[d] * nj[s] * X[s]
    want = aggr @ W1
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-5,
                               atol=1e-6)


def test_sage_golden():
    conv = convs.SAGEConv(dim=D)
    params = {"params": {"Dense_0": {"kernel": jnp.asarray(W1)},
                         "Dense_1": {"kernel": jnp.asarray(W2)}}}
    # reference sage_conv.py:26-44: self_fc(x) + neigh_fc(mean_j x_j)
    aggr = np.zeros((T, D))
    cnt = np.zeros(T)
    for d, s in _edges():
        aggr[d] += X[s]
        cnt[d] += 1
    mean = aggr / np.maximum(cnt, 1)[:, None]
    want = X[:T] @ W1 + mean @ W2
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-5,
                               atol=1e-6)


def test_gat_golden():
    conv = convs.GATConv(dim=D)
    params = {"params": {"Dense_0": {"kernel": jnp.asarray(W1)},
                         "Dense_1": {"kernel": jnp.asarray(A1)},
                         "Dense_2": {"kernel": jnp.asarray(A2)}}}
    # reference gat_conv.py:64-70: h = fc(x); per-edge
    # alpha = leaky_relu(att_i(h_i) + att_j(h_j), 0.2) -> per-target
    # softmax over real edges -> out = sum_j alpha_j h_j
    H = X @ W1
    ai = (H @ A1)[:, 0]
    aj = (H @ A2)[:, 0]
    out = np.zeros((T, D))
    for t in range(T):
        es = [(d, s) for d, s in _edges() if d == t]
        sc = np.array([ai[t] + aj[s] for _, s in es])
        sc = np.where(sc > 0, sc, 0.2 * sc)
        e = np.exp(sc - sc.max())
        p = e / e.sum()
        for w, (_, s) in zip(p, es):
            out[t] += w * H[s]
    np.testing.assert_allclose(_apply(conv, params), out, rtol=1e-5,
                               atol=1e-6)


def test_gin_golden():
    conv = convs.GINConv(dim=D, eps=0.3, train_eps=False)
    params = {"params": {"Dense_0": {"kernel": jnp.asarray(W1)}}}
    # reference gin_conv.py: fc((1 + eps) * x + sum_j x_j)
    aggr = np.zeros((T, D))
    for d, s in _edges():
        aggr[d] += X[s]
    want = ((1 + 0.3) * X[:T] + aggr) @ W1
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-5,
                               atol=1e-6)


def test_graphconv_golden():
    conv = convs.GraphConv(dim=D)
    params = conv.init(jax.random.PRNGKey(0),
                       (jnp.asarray(X[:T]), jnp.asarray(X)), _block())
    params = jax.tree.map(lambda a: a, params)
    k0 = np.asarray(params["params"]["Dense_0"]["kernel"])
    k1 = np.asarray(params["params"]["Dense_1"]["kernel"])
    b1 = np.asarray(params["params"]["Dense_1"]["bias"])
    # reference graph_conv.py: fc(x_j) -> mean -> + linear(x) (with bias)
    H = X @ k0
    aggr = np.zeros((T, D))
    cnt = np.zeros(T)
    for d, s in _edges():
        aggr[d] += H[s]
        cnt[d] += 1
    want = X[:T] @ k1 + b1 + aggr / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-5,
                               atol=1e-6)


def test_dna_golden():
    """reference dna_conv.py: shared in_fc on both endpoints, per-edge
    q.k / sqrt(d) score, restricted_softmax over the singleton key axis
    (== sigmoid, the implicit zero logit of dna_conv.py:72-81), gated
    value, scatter MEAN over each target's real edges."""
    conv = convs.DNAConv(dim=D, heads=1)
    Wq = RNG.normal(size=(D, D)).astype(np.float32)
    bq = np.zeros(D, np.float32)
    Wk = RNG.normal(size=(D, D)).astype(np.float32)
    Wv = RNG.normal(size=(D, D)).astype(np.float32)
    params = {"params": {
        "Dense_0": {"kernel": W1},                 # shared in_fc
        "Dense_1": {"kernel": Wq, "bias": bq},     # q
        "Dense_2": {"kernel": Wk, "bias": bq},     # k
        "Dense_3": {"kernel": Wv, "bias": bq},     # v
    }}
    h = X @ W1
    q = h @ Wq
    k = h @ Wk
    v = h @ Wv
    want = np.zeros((T, D), np.float32)
    for t in range(T):
        es = [(d, s) for d, s in _edges() if d == t]
        msgs = []
        for d_, s_ in es:
            score = float(q[d_] @ k[s_]) / np.sqrt(D)
            gate = 1.0 / (1.0 + np.exp(-score))
            msgs.append(gate * v[s_])
        want[t] = np.mean(msgs, axis=0)
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-4,
                               atol=1e-5)


def _deg():
    """Per-endpoint degrees over the REAL edges of the fixture."""
    dt = np.zeros(T)
    ds_ = np.zeros(S)
    for d, s in _edges():
        dt[d] += 1
        ds_[s] += 1
    return dt, ds_


def test_agnn_golden():
    """reference agnn_conv.py: cosine attention with learnable beta,
    scatter_softmax over each target's edges, add-aggregation of the raw
    source features."""
    conv = convs.AGNNConv(dim=D)
    beta = 1.7
    params = {"params": {"beta": np.asarray([beta], np.float32)}}
    xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = np.zeros((T, D), np.float32)
    for t in range(T):
        es = [(d, s) for d, s in _edges() if d == t]
        scores = np.asarray([beta * float(xn[d] @ xn[s]) for d, s in es])
        a = np.exp(scores - scores.max())
        a = a / a.sum()
        want[t] = sum(ai * X[s] for ai, (_, s) in zip(a, es))
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-4,
                               atol=1e-5)


def test_tag_golden():
    """reference tag_conv.py: K sym-norm propagations, concat
    [x, hop1..hopK] -> one bias-free fc (K=1 keeps the hand math flat)."""
    conv = convs.TAGConv(dim=D, K=1)
    Wc = RNG.normal(size=(2 * D, D)).astype(np.float32)
    params = {"params": {"Dense_0": {"kernel": Wc}}}
    dt, ds_ = _deg()
    hop1 = np.zeros((T, D), np.float32)
    for d, s in _edges():
        hop1[d] += X[s] / np.sqrt(dt[d] * ds_[s])
    want = np.concatenate([X[:T], hop1], axis=1) @ Wc
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-4,
                               atol=1e-5)


def test_appnp_golden():
    """reference appnp_conv.py: out = (1-a) * sym_norm_aggr + a * x
    (K=1 iteration)."""
    conv = convs.APPNPConv(dim=D, K=1, alpha=0.25)
    params = {"params": {}}
    dt, ds_ = _deg()
    aggr = np.zeros((T, D), np.float32)
    for d, s in _edges():
        aggr[d] += X[s] / np.sqrt(dt[d] * ds_[s])
    want = 0.75 * aggr + 0.25 * X[:T]
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-4,
                               atol=1e-5)


def test_sgcn_golden():
    """reference sgcn_conv.py: K sym-norm propagations then one
    bias-free fc (K=1)."""
    conv = convs.SGCNConv(dim=D, K=1)
    Wc = RNG.normal(size=(D, D)).astype(np.float32)
    params = {"params": {"Dense_0": {"kernel": Wc}}}
    dt, ds_ = _deg()
    hop1 = np.zeros((T, D), np.float32)
    for d, s in _edges():
        hop1[d] += X[s] / np.sqrt(dt[d] * ds_[s])
    want = hop1 @ Wc
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-4,
                               atol=1e-5)


def test_relation_golden():
    """reference relation_conv.py:33-72: per-relation matrix on each
    edge's source feature, scatter MEAN, + bias-free self fc."""
    conv = convs.RelationConv(dim=D, num_relations=2)
    M = RNG.normal(size=(2, D, D)).astype(np.float32)
    Wf = RNG.normal(size=(D, D)).astype(np.float32)
    params = {"params": {"matrix": M, "Dense_0": {"kernel": Wf}}}
    attr = np.array([0, 1, 0, 1, 0, 1, 0], np.int32)
    blk = _block()
    x = jnp.asarray(X)
    got = np.asarray(conv.apply(params, (x[:T], x), blk,
                                edge_attr=jnp.asarray(attr)))
    want = np.zeros((T, D), np.float32)
    for t in range(T):
        msgs = [M[attr[k]] @ X[s]
                for k, (d, s) in enumerate(zip(DST, SRC))
                if MASK[k] > 0 and d == t]
        want[t] = X[t] @ Wf + np.mean(msgs, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_arma_golden():
    """reference arma_conv.py (T=1, K=1): out = relu(sym_norm_aggr(W x_j)
    + V x_i)."""
    conv = convs.ARMAConv(dim=D, K=1, T=1)
    Wk = RNG.normal(size=(D, D)).astype(np.float32)
    Vk = RNG.normal(size=(D, D)).astype(np.float32)
    params = {"params": {"Dense_0": {"kernel": Wk},
                         "Dense_1": {"kernel": Vk}}}
    dt, ds_ = _deg()
    aggr = np.zeros((T, D), np.float32)
    for d, s in _edges():
        aggr[d] += (X[s] @ Wk) / np.sqrt(dt[d] * ds_[s])
    want = np.maximum(aggr + X[:T] @ Vk, 0.0)
    np.testing.assert_allclose(_apply(conv, params), want, rtol=1e-4,
                               atol=1e-5)


def test_gated_golden():
    """reference gated_graph_conv.py (1 processing step): message fc ->
    masked scatter-ADD -> GRU state update (state = target features,
    input = the aggregate). The GRU cell itself is applied directly with
    the conv's own parameters; the golden part is the aggregation wiring
    and the state/input orientation."""
    import flax.linen as nn_
    conv = convs.GatedConv(dim=D, processing_steps=1)
    blk = _block()
    x = jnp.asarray(X)
    variables = conv.init(jax.random.PRNGKey(3), (x[:T], x), blk)
    got = np.asarray(conv.apply(variables, (x[:T], x), blk))

    Wfc = np.asarray(variables["params"]["Dense_0"]["kernel"])
    msgs = X @ Wfc
    aggr = np.zeros((T, D), np.float32)
    for d, s in _edges():
        aggr[d] += msgs[s]
    cell = nn_.GRUCell(features=D)
    cell_params = {"params": variables["params"]["GRUCell_0"]}
    want, _ = cell.apply(cell_params, jnp.asarray(X[:T]),
                         jnp.asarray(aggr))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end golden forward parity (VERDICT r4 #8): the ENTIRE
# dataflow-to-loss pipeline — block bookkeeping (capped full
# neighborhoods, self loops, padding; reference
# neighbor_dataflow.py:45-76), featurize, per-block conv+relu
# (base_gnn.py:74-92), output fc, supervised head + masked sigmoid
# xent (mp_utils/base.py:24-48) — re-derived in pure numpy from the
# CSR arrays and the initialized weights, compared against
# GNNNet/SuperviseModel.apply. Pins flow bookkeeping + conv algebra +
# loss together, not just conv math.
# ---------------------------------------------------------------------------

def _np_blocks(g, roots, caps, ets):
    """Numpy re-derivation of GCNDataFlow: per hop, each target's full
    neighborhood over the union of edge-type groups in CSR order,
    truncated at cap, padded -1; sources = concat(targets, nbrs.flat);
    self-loop edges appended."""
    gp = np.asarray(g.group_ptr)
    adj_dst = np.asarray(g.adj_dst)
    ET = g.meta.num_edge_types
    blocks = []
    cur = np.asarray(roots, np.int64)
    for cap in caps:
        T = len(cur)
        nbr = np.full((T, cap), -1, np.int64)
        for i, n in enumerate(cur):
            if n < 0:
                continue
            cands = []
            for t in ets:
                lo, hi = gp[n * ET + t], gp[n * ET + t + 1]
                cands.extend(adj_dst[lo:hi].tolist())
            nbr[i, :min(cap, len(cands))] = cands[:cap]
        # edges: per target, cap sampled slots then T self loops
        dst = np.repeat(np.arange(T), cap)
        src = T + np.arange(T * cap)
        mask = ((nbr.reshape(-1) >= 0)
                & np.repeat(cur >= 0, cap)).astype(np.float32)
        loop = np.arange(T)
        dst = np.concatenate([dst, loop])
        src = np.concatenate([src, loop])
        mask = np.concatenate([mask, (cur >= 0).astype(np.float32)])
        n_id = np.concatenate([cur, nbr.reshape(-1)])
        blocks.append(dict(n_id=n_id, dst=dst, src=src, mask=mask,
                           size=(T, len(n_id))))
        cur = n_id
    return list(reversed(blocks))


def _np_gcn_conv(x, blk, W):
    T = blk["size"][0]
    dst, src, mask = blk["dst"], blk["src"], blk["mask"]
    deg_t = np.zeros(T)
    np.add.at(deg_t, dst, mask)
    deg_s = np.zeros(blk["size"][1])
    np.add.at(deg_s, src, mask)
    ni = np.where(deg_t > 0, deg_t, 1.0) ** -0.5
    nj = np.where(deg_s > 0, deg_s, 1.0) ** -0.5
    scale = ni[dst] * nj[src] * mask
    out = np.zeros((T, x.shape[1]))
    np.add.at(out, dst, x[src] * scale[:, None])
    return out @ W


def _np_sage_conv(x, blk, W_self, W_aggr):
    T = blk["size"][0]
    dst, src, mask = blk["dst"], blk["src"], blk["mask"]
    tot = np.zeros((T, x.shape[1]))
    np.add.at(tot, dst, x[src] * mask[:, None])
    cnt = np.zeros(T)
    np.add.at(cnt, dst, mask)
    aggr = tot / np.maximum(cnt, 1e-7)[:, None]
    return x[:T] @ W_self + aggr @ W_aggr


@pytest.mark.parametrize("conv_name", ["gcn", "sage"])
def test_e2e_forward_loss_golden(toy_graph, conv_name):
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn
    g = toy_graph.tensors
    ets = (0, 1)
    caps = [4, 3]
    feat = encoders.ShallowEncoder(dense_names=("dense2",))
    net = gnn.GNNNet(conv=conv_name,
                     flow=flows.GCNDataFlow(caps, [ets, ets]),
                     dims=(5, 4), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name="price",
                               label_dim=1)
    roots = jnp.asarray([0, 3, 5, 7, -1], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, g, roots)
    out = model.apply(params, g, roots,
                      rngs={"sample": jax.random.PRNGKey(2)})

    # ---- independent numpy pipeline from the same weights ----
    pe = params["params"]["embedder"]
    blocks = _np_blocks(g, np.asarray(roots), caps, ets)
    feats = np.asarray(g.dense_nf["dense2"], np.float64)
    n_id0 = blocks[0]["n_id"]
    x = np.where((n_id0 >= 0)[:, None],
                 feats[np.maximum(n_id0, 0)], 0.0)
    for li, blk in enumerate(blocks):
        cw = {k: np.asarray(v["kernel"], np.float64)
              for k, v in pe[f"conv_{li}"].items()}
        if conv_name == "gcn":
            x = _np_gcn_conv(x, blk, cw["Dense_0"])
        else:
            x = _np_sage_conv(x, blk, cw["Dense_0"], cw["Dense_1"])
        x = np.maximum(x, 0.0)                          # relu
    emb = x @ np.asarray(pe["out_fc"]["kernel"], np.float64) \
        + np.asarray(pe["out_fc"]["bias"], np.float64)
    logit = emb @ np.asarray(params["params"]["head_fc"]["kernel"],
                             np.float64)
    label = np.where((np.asarray(roots) >= 0)[:, None],
                     np.asarray(g.dense_nf["price"])[
                         np.maximum(np.asarray(roots), 0), :1], 0.0)
    valid = (np.asarray(roots) >= 0).astype(np.float64)[:, None]
    xent = (np.maximum(logit, 0) - logit * label
            + np.log1p(np.exp(-np.abs(logit)))) * valid
    loss = xent.sum() / max(valid.sum() * 1, 1.0)

    assert np.abs(logit).max() > 1e-3          # non-vacuous pin
    np.testing.assert_allclose(np.asarray(out["logit"]), logit,
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(out["loss"]), loss, rtol=2e-5)
