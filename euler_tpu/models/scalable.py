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


def _sharded_store_read(view, table, ids):
    """Owner-routed lookup over a graph-axis-sharded store
    (row r on shard r % S at local row r // S): all_gather the query
    ids, each shard gathers its rows, all_to_all the answers back."""
    S, axis = view.num_shards, view.axis
    n_local = table.shape[0]
    shape_in = ids.shape
    flat = ids.reshape(-1)
    b = flat.shape[0]
    from euler_tpu.parallel import comms
    alln = comms.all_gather(flat, axis, axis=0).reshape(-1)
    owned = (alln >= 0) & (alln % S == jax.lax.axis_index(axis))
    rows = jnp.clip(jnp.where(owned, alln, 0) // S, 0, n_local - 1)
    v = jnp.where(owned[:, None], table[rows], 0.0)
    ex = comms.all_to_all(v, axis, split_axis=0, concat_axis=0,
                            tiled=True)
    out = ex.reshape(S, b, table.shape[-1]).sum(axis=0)
    return out.reshape(shape_in + (table.shape[-1],))


def _sharded_store_write(view, table, ids, values):
    """Scatter minibatch rows into the sharded store: writes gather over
    the WHOLE mesh so every data-axis replica of a shard applies the
    identical write set (keeps the 'replicated over data, sharded over
    graph' layout consistent). Returns the updated local block."""
    S, axis = view.num_shards, view.axis
    n_local = table.shape[0]
    from euler_tpu.parallel import comms
    ids_all = comms.all_gather(ids, ("data", "graph"), axis=0,
                                 tiled=True)
    val_all = comms.all_gather(values, ("data", "graph"), axis=0,
                                 tiled=True)
    mine = (ids_all >= 0) & (ids_all % S == jax.lax.axis_index(axis))
    rows = jnp.where(mine, ids_all // S, n_local)   # out-of-range drops
    return table.at[rows].set(
        jnp.where(mine[:, None], val_all, 0.0), mode="drop")


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
        from euler_tpu.ops.dispatch import is_shard_view
        roots = jnp.asarray(roots, jnp.int32).reshape(-1)
        key = self.make_rng("sample")
        nbr, w, ty, eid = sampling.sample_neighbor(
            g, key, roots, self.edge_types, self.fanout)
        nmask = nbr >= 0

        sharded = is_shard_view(g)
        Agg = aggr_lib.get(self.aggregator)
        if sharded:
            # graph-axis-sharded stores: row r on shard r % S at local
            # row r // S, boxed so the SPMD plumbing derives
            # PartitionSpec('graph') (the reference keeps the stores on
            # the PS for the same reason, encoders.py:314-327)
            from euler_tpu.models.layers import ManualPartitioned
            S = g.num_shards
            n_local = -(-(self.n_nodes + 1) // S)

            def mkstore(i):
                return ManualPartitioned(
                    jax.random.uniform(jax.random.PRNGKey(i),
                                       (n_local, self.dim),
                                       maxval=self.store_init_maxval),
                    names=("graph", None), mesh=None)
        else:
            def mkstore(i):
                return jax.random.uniform(
                    jax.random.PRNGKey(i), (self.n_nodes + 1, self.dim),
                    maxval=self.store_init_maxval)

        stores = [self.variable("cache", f"store_layer_{i}",
                                lambda i=i: mkstore(i))
                  for i in range(1, self.num_layers)]

        # NB: flax unboxes AxisMetadata transparently on variable access
        # and re-boxes on assignment — module code sees raw local blocks
        def read(store, rows):
            if sharded:
                return _sharded_store_read(g, store.value, rows)
            return store.value[rows]

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
                rows = jnp.where(nbr >= 0, nbr, self.n_nodes)
                neigh_emb = jax.lax.stop_gradient(read(stores[layer],
                                                       rows))

        if train:
            # write fresh minibatch embeddings back
            # (reference: _update_store, encoders.py:374-380)
            for store, emb in zip(stores, node_embs):
                emb = jax.lax.stop_gradient(emb)
                if sharded:
                    store.value = _sharded_store_write(
                        g, store.value, roots, emb)
                else:
                    ok = roots >= 0
                    rows = jnp.where(ok, roots, self.n_nodes)
                    store.value = store.value.at[rows].set(
                        jnp.where(ok[:, None], emb, store.value[rows]))
        out = node_emb
        return jnp.where((roots >= 0)[:, None], out, 0.0)


class ScalableSageNet(ScalableGNNNet):
    """aggregator defaults match the reference's ScalableSageEncoder
    (encoders.py:629-749)."""
    pass
