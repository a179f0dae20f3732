"""Graph convolutions (message passing in bipartite-block COO form).

TPU-native counterparts of the reference's 14 convolutions
(reference: tf_euler/python/convolution/*.py — gather src/dst features by
edge_index, transform per edge, scatter_(aggr) to dst, node update;
conv.py:27-53 base contract). Re-designed as flax.linen modules over
static-shape Blocks: every op carries an edge mask so padded edges drop out
of sums/means/softmaxes, and all matmuls stay dense/batched for the MXU.

Call convention (mirrors conv.Conv.__call__):
    conv(x, block)  with x = (x_tgt [size0,D], x_src [size1,D])
    returns [size0, dim]
``x_tgt`` is the gather(x, res_n_id) of the reference, ``x_src`` the full
previous-layer set; ``block.edge_index[0]`` indexes targets,
``[1]`` sources.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.dataflow.block import Block
from euler_tpu.ops import mp_ops

Array = jnp.ndarray


def _deg_inv_sqrt(block: Block):
    """Symmetric GCN normalization from masked edge counts
    (reference: gcn_conv.py:38-46 norm)."""
    ew = jnp.ones((block.edge_index.shape[1], 1), jnp.float32)
    deg_t = block.scatter("add", ew, block.mask)
    if block.src_deg is not None:
        # source slots are node copies (ELL whole-graph layout): use the
        # flow-provided per-node degrees, not per-slot counts
        deg_s = block.src_deg[:, None].astype(jnp.float32)
    else:
        deg_s = block.scatter_src_add(ew, block.mask)
    return tuple(jnp.where(d > 0, d, 1.0) ** -0.5 for d in (deg_t, deg_s))


def _masked(messages, mask):
    return messages if mask is None else messages * mask[:, None]


def _edge_scale(ni, nj, mask):
    "[E, 1] multiplier combining sym-norm factors and the edge mask."
    sc = ni * nj
    return sc if mask is None else sc * mask[:, None]


class GCNConv(nn.Module):
    """reference: gcn_conv.py:26-54 (sym-norm via two scatter_adds)."""
    dim: int

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        mask = block.mask
        norm_i, norm_j = _deg_inv_sqrt(block)
        ni = block.gather_tgt(norm_i)
        nj = block.gather_src(norm_j)
        out = block.aggregate_neighbors("add", x_src,
                                        scale=_edge_scale(ni, nj, mask))
        return nn.Dense(self.dim, use_bias=False)(out)


class SAGEConv(nn.Module):
    """reference: sage_conv.py:26-44 (self_fc + neigh_fc, mean aggr)."""
    dim: int

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        aggr = block.aggregate_neighbors("mean", x_src, block.mask)
        return (nn.Dense(self.dim, use_bias=False)(x_tgt) +
                nn.Dense(self.dim, use_bias=False)(aggr))


class GATConv(nn.Module):
    """reference: gat_conv.py:41-75 (per-edge additive attention +
    scatter_softmax)."""
    dim: int
    improved: bool = False

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        mask = block.mask
        fc = nn.Dense(self.dim, use_bias=False)
        a1 = nn.Dense(1, use_bias=False)
        a2 = nn.Dense(1, use_bias=False)
        # Everything here is linear in fc's projection, so NEVER project
        # the [S_src, dim] source set: attention scores compose the two
        # projections into one [D_in, 1] vector each (a(fc(x)) =
        # x @ (K_fc K_a) — K_fc extracted by applying fc to the
        # identity), and aggregation runs on RAW features with fc
        # applied to the [T, D_in] result. Exact same math/params; the
        # source-set matmul + its backward were 60% of GAT's premium
        # over sage on-chip (tools/micro/gat_decomp.py).
        eye = jnp.eye(x_src.shape[-1], dtype=x_src.dtype)
        K = fc(eye)                                   # [D_in, dim]
        w1, w2 = a1(K), a2(K)                         # [D_in, 1]
        alpha = (block.gather_tgt(x_tgt @ w1) +
                 block.gather_src(x_src @ w2))
        # tf.nn.leaky_relu's default alpha is 0.2 (gat_conv.py:66), NOT
        # flax's 0.01 — this changed attention values measurably
        alpha = nn.leaky_relu(alpha, negative_slope=0.2)
        alpha = block.softmax(alpha, mask)
        out = fc(block.aggregate_neighbors("add", x_src, scale=alpha))
        if self.improved:
            out = fc(x_tgt) + out
        return out


class GINConv(nn.Module):
    """reference: gin_conv.py:27-60 ((1+eps)*x + sum aggr -> mlp)."""
    dim: int
    eps: float = 0.0
    train_eps: bool = True

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        aggr = block.aggregate_neighbors("add", x_src, block.mask)
        if self.train_eps:
            eps = self.param("eps", lambda k: jnp.asarray([self.eps]))
        else:
            eps = self.eps
        return nn.Dense(self.dim, use_bias=False)((1 + eps) * x_tgt + aggr)


class TAGConv(nn.Module):
    """reference: tag_conv.py (K-hop filter concat -> fc)."""
    dim: int
    K: int = 3

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        size = block.size
        norm_i, norm_j = _deg_inv_sqrt(block)
        ni = block.gather_tgt(norm_i)
        nj = block.gather_src(norm_j)
        xs = [x_tgt]
        cur_tgt, cur_src = x_tgt, x_src
        for _ in range(self.K):
            cur = block.aggregate_neighbors(
                "add", cur_src, scale=_edge_scale(ni, nj, block.mask))
            xs.append(cur)
            # next hop propagates the filtered signal (targets prefix the
            # source set, so pad the remainder with the original sources)
            cur_src = jnp.concatenate(
                [cur, cur_src[size[0]:]], axis=0) if size[1] > size[0] else cur
        return nn.Dense(self.dim, use_bias=False)(
            jnp.concatenate(xs, axis=-1))


class SGCNConv(nn.Module):
    """reference: sgcn_conv.py (K normalized propagations -> single fc)."""
    dim: int
    K: int = 1

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        size = block.size
        norm_i, norm_j = _deg_inv_sqrt(block)
        ni = block.gather_tgt(norm_i)
        nj = block.gather_src(norm_j)
        cur_tgt, cur_src = x_tgt, x_src
        for _ in range(self.K):
            cur_tgt = block.aggregate_neighbors(
                "add", cur_src, scale=_edge_scale(ni, nj, block.mask))
            cur_src = jnp.concatenate(
                [cur_tgt, cur_src[size[0]:]], axis=0) \
                if size[1] > size[0] else cur_tgt
        return nn.Dense(self.dim, use_bias=False)(cur_tgt)


class AGNNConv(nn.Module):
    """reference: agnn_conv.py (cosine attention with learnable beta)."""
    dim: int  # unused (propagation only) — kept for registry uniformity

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        beta = self.param("beta", lambda k: jnp.asarray([1.0]))
        ni = block.gather_tgt(_l2norm(x_tgt))
        nj = block.gather_src(_l2norm(x_src))
        alpha = jnp.sum(beta * (ni * nj), axis=-1, keepdims=True)
        alpha = block.softmax(alpha, block.mask)
        return block.aggregate_neighbors("add", x_src, scale=alpha)


def _l2norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


class APPNPConv(nn.Module):
    """reference: appnp_conv.py (personalized-pagerank propagation)."""
    dim: int
    K: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        size = block.size
        norm_i, norm_j = _deg_inv_sqrt(block)
        ni = block.gather_tgt(norm_i)
        nj = block.gather_src(norm_j)
        out_tgt, out_src = x_tgt, x_src
        for _ in range(self.K):
            aggr = block.aggregate_neighbors(
                "add", out_src, scale=_edge_scale(ni, nj, block.mask))
            out_tgt = (1 - self.alpha) * aggr + self.alpha * x_tgt
            out_src = jnp.concatenate(
                [out_tgt, out_src[size[0]:]], axis=0) \
                if size[1] > size[0] else out_tgt
        return out_tgt


class GraphConv(nn.Module):
    """reference: graph_conv.py (fc on neighbors, mean, + linear self)."""
    dim: int

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        h_src = nn.Dense(self.dim, use_bias=False)(x_src)
        aggr = block.aggregate_neighbors("mean", h_src, block.mask)
        return nn.Dense(self.dim, use_bias=True)(x_tgt) + aggr


class ARMAConv(nn.Module):
    """reference: arma_conv.py (K parallel stacks, T recursive layers)."""
    dim: int
    K: int = 2
    T: int = 1
    shared_weights: bool = False

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        size = block.size
        norm_i, norm_j = _deg_inv_sqrt(block)
        ni = block.gather_tgt(norm_i)
        nj = block.gather_src(norm_j)
        nW = 1 if self.shared_weights else self.T
        ws = [nn.Dense(self.K * self.dim, use_bias=False) for _ in range(nW)]
        vs = [nn.Dense(self.K * self.dim, use_bias=False) for _ in range(nW)]
        cur_tgt, cur_src = x_tgt, x_src
        out = None
        for t in range(self.T):
            w = ws[0 if self.shared_weights else t]
            v = vs[0 if self.shared_weights else t]
            aggr = block.aggregate_neighbors(
                "add", w(cur_src), scale=_edge_scale(ni, nj, block.mask))
            out = nn.relu(aggr + v(x_tgt))
            cur_tgt = out
            if size[1] > size[0] and x_src.shape[0] == size[1]:
                cur_src = jnp.concatenate(
                    [out, jnp.broadcast_to(
                        v(x_src)[size[0]:], (size[1] - size[0],
                                             self.K * self.dim))], axis=0)
            else:
                # whole-graph layouts (edge-list or compact ELL table):
                # the next source set IS the per-node output
                cur_src = out
        out = out.reshape(-1, self.K, self.dim)
        return jnp.mean(out, axis=1)


class DNAConv(nn.Module):
    """reference: dna_conv.py — per-edge QKV attention with RESTRICTED
    softmax + mean aggregation.

    The reference's restricted_softmax (dna_conv.py:72-81) runs over the
    key axis, which per edge has length 1 with an implicit extra zero
    logit — algebraically a per-edge SIGMOID gate on the q·k score, NOT
    a softmax across a target's edges. The shared ``in_fc`` projects
    both endpoints. Deviation: the reference's in-block sym-norm
    (norm_i*norm_j, dna_conv.py:105-113) is folded out — fixed-fanout
    blocks make norm_i a constant the next layer absorbs, and in-block
    source degrees are ~1 under sampling."""
    dim: int
    heads: int = 1

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        mask = block.mask
        d = self.dim
        h = self.heads
        in_fc = nn.Dense(d, use_bias=False)       # shared (dna_conv.py:94)
        x_tgt, x_src = in_fc(x_tgt), in_fc(x_src)
        # q/k/v are per-node linear maps: project then expand per edge
        q = block.gather_tgt(nn.Dense(d)(x_tgt))
        k = block.gather_src(nn.Dense(d)(x_src))
        v = block.gather_src(nn.Dense(d)(x_src))
        dh = d // h
        score = jnp.sum(q.reshape(-1, h, dh) * k.reshape(-1, h, dh),
                        axis=-1) / jnp.sqrt(dh)  # [E, h]
        gate = jax.nn.sigmoid(score)             # restricted softmax
        msg = (gate[:, :, None] * v.reshape(-1, h, dh)).reshape(-1, d)
        return block.scatter("mean", msg, mask)


class GatedConv(nn.Module):
    """reference: gated_graph_conv.py (message fc + GRU state update)."""
    dim: int
    processing_steps: int = 2

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        size = block.size
        if x_tgt.shape[-1] != self.dim:
            proj = nn.Dense(self.dim, use_bias=False)
            x_tgt, x_src = proj(x_tgt), proj(x_src)
        h_tgt, h_src = x_tgt, x_src
        gru = nn.GRUCell(features=self.dim)
        for i in range(self.processing_steps):
            fc = nn.Dense(self.dim, use_bias=False)
            aggr = block.aggregate_neighbors("add", fc(h_src),
                                             block.mask)
            h_tgt, _ = gru(h_tgt, aggr)
            h_src = jnp.concatenate([h_tgt, h_src[size[0]:]], axis=0) \
                if size[1] > size[0] else h_tgt
        return h_tgt


class RelationConv(nn.Module):
    """reference: relation_conv.py:33-69 (RGCN per-relation matrices
    gathered by edge_attr; mean aggr + self fc)."""
    dim: int
    num_relations: int = 1

    @nn.compact
    def __call__(self, x, block: Block, edge_attr: Array = None):
        x_tgt, x_src = x
        ei, mask = block.edge_index, block.mask
        if edge_attr is None:
            if block.e_id is None:
                raise ValueError("RelationConv needs edge_attr or e_id")
            edge_attr = jnp.zeros((ei.shape[1],), jnp.int32)
        fea_dim = x_src.shape[-1]
        matrix = self.param(
            "matrix", nn.initializers.variance_scaling(1.0, "fan_avg",
                                                       "truncated_normal"),
            (self.num_relations, self.dim, fea_dim))
        xj = block.gather_src(x_src)
        attr = jnp.clip(edge_attr, 0, self.num_relations - 1)
        # scatter is linear in the messages, so aggregate raw features per
        # relation FIRST, then apply the relation matrices to the
        # [T,R,f] sums with one MXU einsum — never materializing [E,d]
        # per-edge transformed messages R times
        m = mask.astype(xj.dtype) if mask is not None else None
        R = self.num_relations
        if block.fanout is not None and not block.shared_src:
            # regular layout: ONE batched einsum replaces R sequential
            # masked reduces (R passes over [E,f] cost 4.3x a sage step
            # at R=4 on chip — BENCH_SUITE r5 rgcn)
            xj_s, xj_l = block._split(xj)               # [T,C,f], [T,f]
            at_s, at_l = block._split(attr)
            oh_s = jax.nn.one_hot(at_s, R, dtype=xj.dtype)  # [T,C,R]
            if m is not None:
                m_s, m_l = block._split(m)
                oh_s = oh_s * m_s[..., None]
            s = jnp.einsum("tcf,tcr->trf", xj_s, oh_s)
            if xj_l is not None:
                oh_l = jax.nn.one_hot(at_l, R, dtype=xj.dtype)
                if m is not None:
                    oh_l = oh_l * m_l[..., None]
                s = s + xj_l[:, None, :] * oh_l[..., None]   # [T,R,f]
        else:
            sums = []
            for r in range(R):
                sel = (attr == r).astype(xj.dtype)
                sel = sel * m if m is not None else sel
                sums.append(block.scatter("add", xj * sel[:, None], None))
            s = jnp.stack(sums, axis=1)                 # [T, R, f]
        tot = jnp.einsum("trf,rdf->td", s, matrix)      # [T, d]
        ones = jnp.ones((xj.shape[0], 1), xj.dtype)
        cnt = block.scatter("add", ones, mask)          # valid-edge count
        aggr = tot / jnp.maximum(cnt, 1e-7)             # masked-mean parity
        return nn.Dense(self.dim, use_bias=False)(x_tgt) + aggr


_CONVS = {
    "gcn": GCNConv,
    "sage": SAGEConv,
    "graphsage": SAGEConv,
    "gat": GATConv,
    "gin": GINConv,
    "tag": TAGConv,
    "tagcn": TAGConv,
    "sgcn": SGCNConv,
    "agnn": AGNNConv,
    "appnp": APPNPConv,
    "graph": GraphConv,
    "graphgcn": GraphConv,
    "arma": ARMAConv,
    "dna": DNAConv,
    "gated": GatedConv,
    "gated_graph": GatedConv,
    "relation": RelationConv,
    "rgcn": RelationConv,
}


def get_conv_class(name: str):
    """reference: mp_utils/utils.py get_conv_class."""
    return _CONVS[name]
