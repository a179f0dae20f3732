"""Scalable GNN encoders with historical-embedding caches.

TPU-native counterpart of the reference's ScalableGCN/ScalableSage
(reference: tf_euler/python/utils/encoders.py:294-410 and :629-749 —
per-layer non-trainable embedding "stores" of shape [max_id+2, dim]; in
training, layer-l neighbor inputs come from the layer-(l-1) store instead
of recursive expansion, the minibatch's fresh embeddings are written back,
and an asynchronous "gradient store" pushes d(loss)/d(store-entry) into
the parameters on the node's next visit).

Re-design for JAX/TPU: the stores are flax variables in a mutable
``cache`` collection living in device memory (donated across steps, so
updates are in-place buffer reuse under XLA). Neighbor lookups are
``stop_gradient``-ed — the detached-historical-embedding formulation
(VR-GCN/GNNAutoScale style); the reference's asynchronous gradient-store
channel exists to emulate exactly this one-step-stale backprop on a
parameter server and is not needed when the cache is device-resident.
The ``train=False`` path reads the caches without writing.

Cost model: a fanout-[k1..kL] recursive GNN touches O(prod k) nodes per
root; the scalable form touches O(k1) regardless of depth — the GNN
analogue of activation caching for long-context scaling (SURVEY.md §5
"long-context analog").
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.graph.store import GraphTensors
from euler_tpu.models import aggregators as aggr_lib
from euler_tpu.ops import sampling

Array = jnp.ndarray


class ScalableGNNNet(nn.Module):
    """num_layers of aggregator over 1-hop samples + per-layer caches.

    feature: encoder module mapping (g, n_id) -> [B, D0].
    """

    edge_types: Tuple[int, ...]
    num_layers: int
    dim: int
    feature: Any
    n_nodes: int
    fanout: int = 10
    aggregator: str = "mean"
    use_residual: bool = False
    store_init_maxval: float = 0.05

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array,
                 train: bool = True) -> Array:
        roots = jnp.asarray(roots, jnp.int32).reshape(-1)
        key = self.make_rng("sample")
        nbr, w, ty, eid = sampling.sample_neighbor(
            g, key, roots, self.edge_types, self.fanout)
        nmask = nbr >= 0

        Agg = aggr_lib.get(self.aggregator)
        stores = [
            self.variable(
                "cache", f"store_layer_{i}",
                lambda i=i: jax.random.uniform(
                    jax.random.PRNGKey(i), (self.n_nodes + 1, self.dim),
                    maxval=self.store_init_maxval))
            for i in range(1, self.num_layers)]

        node_emb = self.feature(g, roots)
        neigh_emb = self.feature(g, nbr.reshape(-1)).reshape(
            roots.shape[0], self.fanout, -1)

        node_embs = []
        for layer in range(self.num_layers):
            agg = Agg(dim=self.dim, name=f"agg_{layer}")(
                node_emb, neigh_emb, nmask)
            if self.use_residual and agg.shape == node_emb.shape:
                node_emb = node_emb + agg
            else:
                node_emb = agg
            node_embs.append(node_emb)
            if layer < self.num_layers - 1:
                table = stores[layer].value
                rows = jnp.where(nbr >= 0, nbr, self.n_nodes)
                neigh_emb = jax.lax.stop_gradient(table[rows])

        if train:
            # write fresh minibatch embeddings back
            # (reference: _update_store, encoders.py:374-380)
            for store, emb in zip(stores, node_embs):
                ok = roots >= 0
                rows = jnp.where(ok, roots, self.n_nodes)
                store.value = store.value.at[rows].set(
                    jnp.where(ok[:, None], jax.lax.stop_gradient(emb),
                              store.value[rows]))
        out = node_emb
        return jnp.where((roots >= 0)[:, None], out, 0.0)


class ScalableSageNet(ScalableGNNNet):
    """aggregator defaults match the reference's ScalableSageEncoder
    (encoders.py:629-749)."""
    pass
