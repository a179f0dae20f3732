"""GNN nets + supervised/unsupervised heads.

TPU-native counterpart of the reference's model templates
(reference: tf_euler/python/mp_utils/base_gnn.py:27-139 ``BaseGNNNet`` /
``JKGNNNet`` and mp_utils/base.py:24-91 ``SuperviseModel`` /
``UnsuperviseModel``). The sample->gather->aggregate pipeline traces into
one XLA program: the dataflow runs under ``self.make_rng('sample')``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.dataflow.block import Block
from euler_tpu.graph.store import GraphTensors
from euler_tpu.models import convs as convs_lib
from euler_tpu.ops import feature_ops, mp_ops, sampling

Array = jnp.ndarray


class GNNNet(nn.Module):
    """Stack of graph convolutions over a dataflow.

    reference: BaseGNNNet.__call__ (mp_utils/base_gnn.py:74-92): dataflow ->
    to_x(features) -> per-block gather(res_n_id) + conv + relu -> final
    dense. ``feature`` is the to_x featurizer submodule.
    """

    conv: str
    flow: Any                      # dataflow callable (static pytree-leaf-free)
    dims: Tuple[int, ...]          # hidden dims per layer + [output dim]
    feature: nn.Module
    conv_kwargs: dict = None
    relation_from_etype: bool = False  # feed edge types as RGCN edge_attr
    # mixed precision: cast activations to this dtype between stages
    # (params stay f32; the big memory movers — the [S_src, D] feature
    # set, per-edge views, aggregations — halve their HBM traffic in
    # bfloat16, the TPU-native training dtype). None = full f32.
    dtype: Any = None
    # unique-before-gather on the deepest block's feature fetch (the
    # reference optimizer's unique+gather rewrite). Flag-gated OFF: a
    # measured negative on v5e at bench shapes — see
    # ops/util_ops.unique_gather; enable for extreme-duplication
    # frontiers only.
    dedup_features: bool = False

    def _make_conv(self, dim, i):
        cls = convs_lib.get_conv_class(self.conv)
        kw = dict(self.conv_kwargs or {})
        return cls(dim=dim, name=f"conv_{i}", **kw)

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array) -> Array:
        key = self.make_rng("sample")
        if self.relation_from_etype and \
                getattr(self.flow, "payload", True) is False and \
                not getattr(self.flow, "typed", False):
            raise ValueError(
                "relation_from_etype needs edge types: construct the "
                "flow with typed=True (fast path + per-draw types) or "
                "payload=True (fast ids-only sampling carries e_id=-1)")
        blocks = self.flow(g, key, roots)
        if blocks and blocks[0].ell_tpos is not None:
            # whole-graph ELL-pack blocks: keep x COMPACT ([N, D], the
            # per-node table) through every layer — convs aggregate
            # straight from it via the fused _ell_agg vjp, so neither
            # direction ever touches an [N*C, D] source-set tensor
            x = self.feature(g, blocks[0].n_id[: blocks[0].size[0]])
        elif self.dedup_features:
            from euler_tpu.ops.util_ops import unique_gather
            x = unique_gather(lambda ids: self.feature(g, ids),
                              blocks[0].n_id)
        else:
            x = self.feature(g, blocks[0].n_id)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, block in enumerate(blocks):
            conv = self._make_conv(self.dims[i], i)
            if x.shape[0] == block.size[0] != block.size[1] and \
                    block.ell_tpos is None:
                # dynamic whole-graph ELL (no transpose pack): rebuild
                # the source set with a plain row gather
                x = jnp.where((block.n_id >= 0)[:, None],
                              x[jnp.maximum(block.n_id, 0)], 0)
            x_tgt = x[: block.size[0]]
            if self.relation_from_etype:
                # prefer the types the sampling verb already returned with
                # the block; resolving via eid all-gathers across shards
                if block.e_type is not None:
                    ty = block.e_type
                else:
                    ty = feature_ops.get_edge_type(g, block.e_id)
                edge_attr = jnp.maximum(ty, 0)
                x = conv((x_tgt, x), block, edge_attr=edge_attr)
            else:
                x = conv((x_tgt, x), block)
            x = nn.relu(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
        if x.shape[0] != roots.shape[0]:
            # whole-graph flow: pick out the requested rows
            x = jnp.where((roots >= 0)[:, None],
                          x[jnp.maximum(roots, 0)], 0.0)
        return nn.Dense(self.dims[-1], name="out_fc")(x)


class JKGNNNet(nn.Module):
    """Jumping-knowledge variant (reference: base_gnn.py:94-139)."""

    conv: str
    flow: Any
    dims: Tuple[int, ...]
    feature: nn.Module
    jk_mode: str = "concat"  # 'concat' | 'maxpool'
    conv_kwargs: dict = None

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array) -> Array:
        key = self.make_rng("sample")
        blocks = self.flow(g, key, roots)
        if blocks and blocks[0].ell_tpos is not None:
            x = self.feature(g, blocks[0].n_id[: blocks[0].size[0]])
        else:
            x = self.feature(g, blocks[0].n_id)
        jk_hidden = []
        cls = convs_lib.get_conv_class(self.conv)
        for i, block in enumerate(blocks):
            conv = cls(dim=self.dims[i], name=f"conv_{i}",
                       **(self.conv_kwargs or {}))
            if x.shape[0] == block.size[0] != block.size[1] and \
                    block.ell_tpos is None:
                x = jnp.where((block.n_id >= 0)[:, None],
                              x[jnp.maximum(block.n_id, 0)], 0)
            x_tgt = x[: block.size[0]]
            x = nn.relu(conv((x_tgt, x), block))
            jk_hidden = [h[: block.size[0]] for h in jk_hidden]
            jk_hidden.append(x)
        if self.jk_mode == "concat":
            x = jnp.concatenate(jk_hidden, axis=1)
        else:
            x = jnp.sum(jnp.stack(jk_hidden, 1), 1)
        if x.shape[0] != roots.shape[0]:
            x = jnp.where((roots >= 0)[:, None],
                          x[jnp.maximum(roots, 0)], 0.0)
        return nn.Dense(self.dims[-1], name="out_fc")(x)


class EmbedOnly(nn.Module):
    """Pure id-embedding 'net' (DeepWalk/LINE context towers)."""

    max_id: int
    dim: int

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array) -> Array:
        table = nn.Embed(self.max_id + 2, self.dim)
        ids = jnp.where(roots >= 0, roots, self.max_id + 1)
        return table(ids)


class SuperviseModel(nn.Module):
    """Multi-label supervised head: sigmoid CE + f1
    (reference: mp_utils/base.py:24-48)."""

    embedder: nn.Module
    label_name: str
    label_dim: int

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array):
        (label,) = feature_ops.get_dense_feature(g, roots, [self.label_name])
        label = label[:, : self.label_dim]
        emb = self.embedder(g, roots)
        logit = nn.Dense(self.label_dim, use_bias=False,
                         name="head_fc")(emb)
        valid = (roots >= 0).astype(jnp.float32)[:, None]
        xent = _sigmoid_xent(logit, label) * valid
        loss = jnp.sum(xent) / jnp.maximum(jnp.sum(valid) * self.label_dim,
                                           1.0)
        return dict(embedding=emb, logit=logit, label=label, loss=loss,
                    valid=valid)


class UnsuperviseModel(nn.Module):
    """Skip-gram-style head: src/pos/neg sigmoid CE + mrr
    (reference: mp_utils/base.py:50-91)."""

    embedder: nn.Module
    context_embedder: nn.Module
    edge_types: Tuple[int, ...]
    node_type: int = -1
    num_negs: int = 20

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array):
        ks, kn = jax.random.split(self.make_rng("sample"))
        B = roots.shape[0]
        pos, _ = sampling.sample_neighbor_fast(g, ks, roots,
                                               self.edge_types, 1)
        negs = sampling.sample_node(g, kn, B * self.num_negs,
                                    self.node_type).reshape(B, self.num_negs)
        emb = self.embedder(g, roots)                       # [B, D]
        emb_pos = self.context_embedder(g, pos[:, 0])       # [B, D]
        emb_negs = self.context_embedder(
            g, negs.reshape(-1)).reshape(B, self.num_negs, -1)
        logits = jnp.sum(emb * emb_pos, axis=-1, keepdims=True)   # [B,1]
        neg_logits = jnp.einsum("bd,bnd->bn", emb, emb_negs)      # [B,N]
        pos_ok = (pos[:, 0] >= 0).astype(jnp.float32)[:, None]
        true_xent = _sigmoid_xent(logits, jnp.ones_like(logits)) * pos_ok
        neg_xent = _sigmoid_xent(neg_logits, jnp.zeros_like(neg_logits))
        loss = (jnp.sum(true_xent) + jnp.sum(neg_xent)) / (
            jnp.maximum(jnp.sum(pos_ok), 1.0) + neg_xent.size)
        return dict(embedding=emb, logits=logits, neg_logits=neg_logits,
                    loss=loss, pos_mask=pos_ok)


def _sigmoid_xent(logits, labels):
    """tf.nn.sigmoid_cross_entropy_with_logits."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
