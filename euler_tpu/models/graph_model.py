"""Graph classification model (graph readout head).

TPU-native counterpart of the reference's GraphModel / GraphGNNNet
(reference: tf_euler/python/mp_utils/base_graph.py:23-46 — sigmoid CE +
accuracy on pooled embeddings; graph_gnn.py:28 GNN + pooling). Consumed by
estimator.GraphEstimator whose batch mirrors
euler_estimator/python/graph_estimator.py:32-77.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.graph.store import GraphTensors
from euler_tpu.models.gnn import _sigmoid_xent

Array = jnp.ndarray


class GraphModel(nn.Module):
    """embedder: node-level GNN; pool: readout over node_graph_idx."""

    embedder: nn.Module
    pool: nn.Module
    label_dim: int

    @nn.compact
    def __call__(self, g: GraphTensors, batch):
        node_ids = batch["node_ids"]          # [M] flat (-1 pad)
        node_graph_idx = batch["node_graph_idx"]  # [M]
        mask = batch["mask"].astype(jnp.float32)  # [M]
        label = batch["label"]                # [B, label_dim]
        x = self.embedder(g, node_ids)        # [M, D]
        pooled = self.pool(x, node_graph_idx, mask)
        logit = nn.Dense(self.label_dim, use_bias=False,
                         name="head_fc")(pooled)
        xent = _sigmoid_xent(logit, label)
        loss = jnp.mean(xent)
        return dict(embedding=pooled, logit=logit, label=label, loss=loss)
