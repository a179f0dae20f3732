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


def _deg_inv_sqrt(edge_index, size, mask):
    """Symmetric GCN normalization from masked edge counts
    (reference: gcn_conv.py:38-46 norm)."""
    ew = jnp.ones((edge_index.shape[1], 1), jnp.float32)
    if mask is not None:
        ew = ew * mask[:, None]
    out = []
    for i in (0, 1):
        deg = mp_ops.scatter_add(ew, edge_index[i], size[i])
        out.append(jnp.where(deg > 0, deg, 1.0) ** -0.5)
    return tuple(out)


def _masked(messages, mask):
    return messages if mask is None else messages * mask[:, None]


class GCNConv(nn.Module):
    """reference: gcn_conv.py:26-54 (sym-norm via two scatter_adds)."""
    dim: int

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        ei, size, mask = block.edge_index, block.size, block.mask
        norm_i, norm_j = _deg_inv_sqrt(ei, size, mask)
        xj = mp_ops.gather(x_src, ei[1])
        ni = mp_ops.gather(norm_i, ei[0])
        nj = mp_ops.gather(norm_j, ei[1])
        out = mp_ops.scatter_add(_masked(ni * nj * xj, mask), ei[0], size[0])
        return nn.Dense(self.dim, use_bias=False)(out)


class SAGEConv(nn.Module):
    """reference: sage_conv.py:26-44 (self_fc + neigh_fc, mean aggr)."""
    dim: int

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        ei, size, mask = block.edge_index, block.size, block.mask
        xj = mp_ops.gather(x_src, ei[1])
        aggr = mp_ops.masked_scatter_("mean", xj, ei[0], size[0], mask)
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
        ei, size, mask = block.edge_index, block.size, block.mask
        fc = nn.Dense(self.dim, use_bias=False)
        h_tgt, h_src = fc(x_tgt), fc(x_src)
        xi = mp_ops.gather(h_tgt, ei[0])
        xj = mp_ops.gather(h_src, ei[1])
        alpha = (nn.Dense(1, use_bias=False)(xi) +
                 nn.Dense(1, use_bias=False)(xj))
        alpha = nn.leaky_relu(alpha)
        alpha = mp_ops.masked_scatter_softmax(alpha, ei[0], size[0], mask)
        out = mp_ops.scatter_add(xj * alpha, ei[0], size[0])
        if self.improved:
            out = h_tgt + out
        return out


class GINConv(nn.Module):
    """reference: gin_conv.py:27-60 ((1+eps)*x + sum aggr -> mlp)."""
    dim: int
    eps: float = 0.0
    train_eps: bool = True

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        ei, size, mask = block.edge_index, block.size, block.mask
        xj = mp_ops.gather(x_src, ei[1])
        aggr = mp_ops.scatter_add(_masked(xj, mask), ei[0], size[0])
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
        ei, size, mask = block.edge_index, block.size, block.mask
        norm_i, norm_j = _deg_inv_sqrt(ei, size, mask)
        ni = mp_ops.gather(norm_i, ei[0])
        nj = mp_ops.gather(norm_j, ei[1])
        xs = [x_tgt]
        cur_tgt, cur_src = x_tgt, x_src
        for _ in range(self.K):
            xj = mp_ops.gather(cur_src, ei[1])
            cur = mp_ops.scatter_add(_masked(ni * nj * xj, mask), ei[0],
                                     size[0])
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
        ei, size, mask = block.edge_index, block.size, block.mask
        norm_i, norm_j = _deg_inv_sqrt(ei, size, mask)
        ni = mp_ops.gather(norm_i, ei[0])
        nj = mp_ops.gather(norm_j, ei[1])
        cur_tgt, cur_src = x_tgt, x_src
        for _ in range(self.K):
            xj = mp_ops.gather(cur_src, ei[1])
            cur_tgt = mp_ops.scatter_add(_masked(ni * nj * xj, mask), ei[0],
                                         size[0])
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
        ei, size, mask = block.edge_index, block.size, block.mask
        beta = self.param("beta", lambda k: jnp.asarray([1.0]))
        ni = mp_ops.gather(_l2norm(x_tgt), ei[0])
        nj = mp_ops.gather(_l2norm(x_src), ei[1])
        xj = mp_ops.gather(x_src, ei[1])
        alpha = jnp.sum(beta * (ni * nj), axis=-1, keepdims=True)
        alpha = mp_ops.masked_scatter_softmax(alpha, ei[0], size[0], mask)
        return mp_ops.scatter_add(xj * alpha, ei[0], size[0])


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
        ei, size, mask = block.edge_index, block.size, block.mask
        norm_i, norm_j = _deg_inv_sqrt(ei, size, mask)
        ni = mp_ops.gather(norm_i, ei[0])
        nj = mp_ops.gather(norm_j, ei[1])
        out_tgt, out_src = x_tgt, x_src
        for _ in range(self.K):
            xj = mp_ops.gather(out_src, ei[1])
            aggr = mp_ops.scatter_add(_masked(ni * nj * xj, mask), ei[0],
                                      size[0])
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
        ei, size, mask = block.edge_index, block.size, block.mask
        h_src = nn.Dense(self.dim, use_bias=False)(x_src)
        hj = mp_ops.gather(h_src, ei[1])
        aggr = mp_ops.masked_scatter_("mean", hj, ei[0], size[0], mask)
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
        ei, size, mask = block.edge_index, block.size, block.mask
        norm_i, norm_j = _deg_inv_sqrt(ei, size, mask)
        ni = mp_ops.gather(norm_i, ei[0])
        nj = mp_ops.gather(norm_j, ei[1])
        nW = 1 if self.shared_weights else self.T
        ws = [nn.Dense(self.K * self.dim, use_bias=False) for _ in range(nW)]
        vs = [nn.Dense(self.K * self.dim, use_bias=False) for _ in range(nW)]
        cur_tgt, cur_src = x_tgt, x_src
        out = None
        for t in range(self.T):
            w = ws[0 if self.shared_weights else t]
            v = vs[0 if self.shared_weights else t]
            xj = w(mp_ops.gather(cur_src, ei[1]))
            aggr = mp_ops.scatter_add(_masked(ni * nj * xj, mask), ei[0],
                                      size[0])
            out = nn.relu(aggr + v(x_tgt))
            cur_tgt = out
            cur_src = jnp.concatenate(
                [out, jnp.broadcast_to(
                    v(x_src)[size[0]:], (size[1] - size[0],
                                         self.K * self.dim))], axis=0) \
                if size[1] > size[0] else out
        out = out.reshape(-1, self.K, self.dim)
        return jnp.mean(out, axis=1)


class DNAConv(nn.Module):
    """reference: dna_conv.py (grouped QKV attention over edges with
    restricted softmax)."""
    dim: int
    heads: int = 1

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        ei, size, mask = block.edge_index, block.size, block.mask
        d = self.dim
        h = self.heads
        x_tgt = nn.Dense(d, use_bias=False)(x_tgt)
        x_src = nn.Dense(d, use_bias=False)(x_src)
        q = nn.Dense(d)(mp_ops.gather(x_tgt, ei[0]))
        k = nn.Dense(d)(mp_ops.gather(x_src, ei[1]))
        v = nn.Dense(d)(mp_ops.gather(x_src, ei[1]))
        dh = d // h
        score = jnp.sum(q.reshape(-1, h, dh) * k.reshape(-1, h, dh),
                        axis=-1) / jnp.sqrt(dh)  # [E, h]
        alpha = mp_ops.masked_scatter_softmax(score, ei[0], size[0], mask)
        msg = (alpha[:, :, None] * v.reshape(-1, h, dh)).reshape(-1, d)
        return mp_ops.masked_scatter_("mean", msg, ei[0], size[0], mask)


class GatedConv(nn.Module):
    """reference: gated_graph_conv.py (message fc + GRU state update)."""
    dim: int
    processing_steps: int = 2

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        ei, size, mask = block.edge_index, block.size, block.mask
        if x_tgt.shape[-1] != self.dim:
            proj = nn.Dense(self.dim, use_bias=False)
            x_tgt, x_src = proj(x_tgt), proj(x_src)
        h_tgt, h_src = x_tgt, x_src
        gru = nn.GRUCell(features=self.dim)
        for i in range(self.processing_steps):
            fc = nn.Dense(self.dim, use_bias=False)
            mj = mp_ops.gather(fc(h_src), ei[1])
            aggr = mp_ops.scatter_add(_masked(mj, mask), ei[0], size[0])
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
        ei, size, mask = block.edge_index, block.size, block.mask
        if edge_attr is None:
            if block.e_id is None:
                raise ValueError("RelationConv needs edge_attr or e_id")
            edge_attr = jnp.zeros((ei.shape[1],), jnp.int32)
        fea_dim = x_src.shape[-1]
        matrix = self.param(
            "matrix", nn.initializers.variance_scaling(1.0, "fan_avg",
                                                       "truncated_normal"),
            (self.num_relations, self.dim, fea_dim))
        xj = mp_ops.gather(x_src, ei[1])
        rel_m = matrix[jnp.clip(edge_attr, 0, self.num_relations - 1)]
        msg = jnp.einsum("edf,ef->ed", rel_m, xj)
        aggr = mp_ops.masked_scatter_("mean", msg, ei[0], size[0], mask)
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
