"""Knowledge-graph embedding models: TransE/H/R/D + DistMult.

TPU-native counterparts of the reference's TransX family
(reference: examples/TransX/transX.py:24-130 base scoring/energy/loss,
transE.py/transH.py/transR.py/transD.py projections, and
examples/distmult/distmult.py). Re-designed as one flax module with a
pluggable projection: the whole src/dst/neg scoring batch is dense einsum
work ideal for the MXU.

The relation id comes from the sampled edge's type by default (the
reference reads an 'id' edge feature; our EdgeEstimator batch carries
(src, dst, etype) directly). ``corrupt`` in {'front','tail','both'} and the
margin loss with mean-of-negatives match transX.py exactly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.graph.store import GraphTensors
from euler_tpu.ops import sampling

Array = jnp.ndarray


def _l2norm(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True),
                           1e-12)


class TransX(nn.Module):
    """Base: entity/relation tables + margin ranking energy."""

    n_entities: int
    n_relations: int
    ent_dim: int
    rel_dim: int
    num_negs: int = 5
    margin: float = 1.0
    l1: bool = True
    corrupt: str = "both"   # 'front' | 'tail' | 'both'
    node_type: int = -1     # negative-sample node type

    def setup(self):
        self.entity_encoder = nn.Embed(self.n_entities + 1, self.ent_dim)
        self.relation_encoder = nn.Embed(self.n_relations + 1, self.rel_dim)
        self._setup_extra()

    def _setup_extra(self):
        pass

    # projection hook: subclass-specific (identity for TransE)
    def project(self, ent_emb, ent_ids, rel_ids):
        return _l2norm(ent_emb)

    def score(self, src_e, rel_e, dst_e):
        """-||h + r - t||_{1 or 2} (transX.py:72-80)."""
        diff = src_e + rel_e - dst_e
        if self.l1:
            return -jnp.sum(jnp.abs(diff), axis=-1)
        return -jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))

    def __call__(self, g: GraphTensors, batch: Array):
        """batch: [B,3] = (src, dst, etype) from EdgeEstimator."""
        src, dst, rel = batch[:, 0], batch[:, 1], batch[:, 2]
        B = src.shape[0]
        key = self.make_rng("sample")
        neg = sampling.sample_node(g, key, B * self.num_negs,
                                   self.node_type).reshape(B, self.num_negs)

        rel_e = _l2norm(self.relation_encoder(jnp.maximum(rel, 0)))
        src_e = self.project(self.entity_encoder(jnp.maximum(src, 0)),
                             src, rel)
        dst_e = self.project(self.entity_encoder(jnp.maximum(dst, 0)),
                             dst, rel)
        rel_b = jnp.broadcast_to(rel[:, None], (B, self.num_negs))
        neg_e = self.project(self.entity_encoder(jnp.maximum(neg, 0)),
                             neg, rel_b)

        pos_scores = self.score(src_e, rel_e, dst_e)[:, None]      # [B,1]
        rel_x = rel_e[:, None, :]
        negs = []
        if self.corrupt in ("front", "both"):
            negs.append(self.score(neg_e, rel_x, dst_e[:, None, :]))
        if self.corrupt in ("tail", "both"):
            negs.append(self.score(src_e[:, None, :], rel_x, neg_e))
        neg_scores = jnp.concatenate(negs, axis=-1)                # [B,N']

        # margin over the MEAN of negative scores (transE.py loss_fn)
        neg_mean = jnp.mean(neg_scores, axis=-1, keepdims=True)
        loss = jnp.mean(jnp.maximum(self.margin + neg_mean - pos_scores, 0))
        return dict(loss=loss, logits=pos_scores, neg_logits=neg_scores,
                    embedding=src_e.reshape(B, -1))


class TransE(TransX):
    """reference: transE.py — identity projection, normed embeddings."""


class TransH(TransX):
    """reference: transH.py — project onto relation hyperplane."""

    def _setup_extra(self):
        self.hyper_vector = nn.Embed(self.n_relations + 1, self.ent_dim)

    def project(self, ent_emb, ent_ids, rel_ids):
        hyper = _l2norm(self.hyper_vector(jnp.maximum(rel_ids, 0)))
        proj = jnp.sum(ent_emb * hyper, axis=-1, keepdims=True) * hyper
        return ent_emb - proj


class TransR(TransX):
    """reference: transR.py — per-relation ent->rel space matrix."""

    def _setup_extra(self):
        self.transfer_matrix = nn.Embed(self.n_relations + 1,
                                        self.ent_dim * self.rel_dim)

    def project(self, ent_emb, ent_ids, rel_ids):
        m = self.transfer_matrix(jnp.maximum(rel_ids, 0)).reshape(
            rel_ids.shape + (self.ent_dim, self.rel_dim))
        out = jnp.einsum("...e,...ed->...d", ent_emb, m)
        return _l2norm(out)


class TransD(TransX):
    """reference: transD.py — dynamic mapping via transfer vectors."""

    def _setup_extra(self):
        self.entity_transfer = nn.Embed(self.n_entities + 1, self.ent_dim)
        self.relation_transfer = nn.Embed(self.n_relations + 1, self.rel_dim)

    def project(self, ent_emb, ent_ids, rel_ids):
        et = self.entity_transfer(jnp.maximum(ent_ids, 0))
        rt = self.relation_transfer(jnp.maximum(rel_ids, 0))
        proj = jnp.sum(ent_emb * et, axis=-1, keepdims=True) * rt
        return _l2norm(ent_emb + proj)


class DistMult(TransX):
    """reference: examples/distmult/distmult.py — bilinear diagonal score
    s = <h, diag(r), t>, same margin loss + optional L2."""

    l2_regular: bool = False
    regular_param: float = 1e-4

    def project(self, ent_emb, ent_ids, rel_ids):
        return _l2norm(ent_emb)

    def score(self, src_e, rel_e, dst_e):
        return jnp.sum(src_e * rel_e * dst_e, axis=-1)

    def __call__(self, g: GraphTensors, batch: Array):
        out = super().__call__(g, batch)
        if self.l2_regular:
            reg = (jnp.sum(self.entity_encoder.embedding ** 2) +
                   jnp.sum(self.relation_encoder.embedding ** 2))
            out["loss"] = out["loss"] + self.regular_param * reg
        return out
