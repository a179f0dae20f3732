"""SPMD training step over a (data, graph) mesh.

TPU-native counterpart of the reference's distributed training
(reference: between-graph TF replication + parameter servers,
tf_euler/scripts/dist_tf_euler.sh and base_estimator.py:164-166, with
graph lookups served by remote shard servers). Here one shard_map-ped
train step does everything: per-device root sampling, cross-shard
neighbor/feature exchange (psum/all_gather inside the ops), local conv
compute, and gradient psum — parameters replicated, optimizer outside.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from euler_tpu.parallel.sharded import (ShardedGraphTensors, shard_specs,
                                        to_view)
from euler_tpu.ops import sampling


def make_sharded_train_step(model, sg: ShardedGraphTensors,
                            tx: optax.GradientTransformation, mesh: Mesh,
                            batch_per_device: int, node_type=-1):
    """Returns jitted ``step(params, opt_state, sg, key) ->
    (params, opt_state, loss)``.

    Layout: params/opt_state replicated; graph arrays P('graph'); each
    device trains on ``batch_per_device`` roots (global batch =
    batch_per_device * n_devices).
    """
    S = sg.num_shards
    gspecs = shard_specs(sg)
    data_size = mesh.shape["data"]

    def local_loss(params, sg_block, key):
        view = to_view(sg_block, "graph")
        di = jax.lax.axis_index("data")
        gi = jax.lax.axis_index("graph")
        # the whole graph-group shares one root draw (collective owner
        # combine needs identical queries), then each member takes a slice
        kroots, ksample = jax.random.split(jax.random.fold_in(key, di))
        roots_all = sampling.sample_node(view, kroots,
                                         batch_per_device * S, node_type)
        roots = jax.lax.dynamic_slice_in_dim(
            roots_all, gi * batch_per_device, batch_per_device)
        ksample = jax.random.fold_in(ksample, gi)
        out = model.apply(params, view, roots, rngs={"sample": ksample})
        return out["loss"]

    def sharded_step(params, opt_state, sg_in, key):
        def lossfn(p, blk, k):
            loss = local_loss(p, blk, k)
            return jax.lax.pmean(loss, ("data", "graph"))

        def grad_body(p, blk, k):
            loss, grads = jax.value_and_grad(lossfn)(p, blk, k)
            grads = jax.lax.pmean(grads, ("data", "graph"))
            return loss, grads

        loss, grads = jax.shard_map(
            grad_body, mesh=mesh,
            in_specs=(P(), gspecs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, sg_in, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(sharded_step, donate_argnums=(0, 1))


def init_sharded_params(model, sg: ShardedGraphTensors, mesh: Mesh,
                        batch_per_device: int, seed: int = 0,
                        node_type=-1):
    """Initialize params by running the model once inside shard_map."""
    S = sg.num_shards
    gspecs = shard_specs(sg)

    def init_body(sg_block, key):
        view = to_view(sg_block, "graph")
        roots = sampling.sample_node(view, jax.random.fold_in(key, 1),
                                     batch_per_device, node_type)
        params = model.init({"params": key, "sample": key}, view, roots)
        return params

    with mesh:
        params = jax.jit(jax.shard_map(
            init_body, mesh=mesh, in_specs=(gspecs, P()),
            out_specs=P(), check_vma=False,
        ))(sg, jax.random.PRNGKey(seed))
    return params


def place_sharded_graph(sg: ShardedGraphTensors, mesh: Mesh):
    """device_put the stacked arrays with their PartitionSpecs."""
    specs = shard_specs(sg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), sg, specs)
