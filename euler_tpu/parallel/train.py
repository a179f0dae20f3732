"""SPMD training step over a (data, graph) mesh.

TPU-native counterpart of the reference's distributed training
(reference: between-graph TF replication + parameter servers,
tf_euler/scripts/dist_tf_euler.sh and base_estimator.py:164-166, with
graph lookups served by remote shard servers). Here one shard_map-ped
train step does everything: per-device batch sampling, cross-shard
neighbor/feature exchange (collectives inside the ops), local conv
compute, and gradient psum — parameters replicated, optimizer outside.

Batch sources are two hooks mirroring the estimator layer's
get_train_from_input (node_estimator.py:31-34, edge_estimator.py:32-45,
graph_estimator.py:45-56):
  * ``ids_fn(view, key, n) -> [n, ...]`` draws the batch ids (nodes,
    edge triples, or graph indices). It runs REPLICATED across each
    graph group (the group shares one draw so the collective owner
    exchange sees identical queries), then each member slices its rows.
  * ``expand_fn(view, ids) -> batch`` (optional) turns the sliced ids
    into the model's input (e.g. graph-label membership blocks).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from euler_tpu.parallel.sharded import (ShardedGraphTensors, shard_specs,
                                        to_view)
from euler_tpu.ops import sampling
from euler_tpu.parallel import comms


def node_ids_fn(node_type=-1):
    """Default batch source: weighted global node sampling
    (node_estimator.py:31-34)."""
    def ids_fn(view, key, n):
        return sampling.sample_node(view, key, n, node_type)
    return ids_fn


def edge_ids_fn(edge_type=-1):
    """Edge-model batch source: sampled (src, dst, etype) triples
    stacked [n, 3] (edge_estimator.py:32-45)."""
    def ids_fn(view, key, n):
        src, dst, ty, _ = sampling.sample_edge(view, key, n, edge_type)
        return jnp.stack([src, dst, ty], axis=1)
    return ids_fn


def graph_ids_fn():
    """Graph-classification batch source: uniform graph indices
    (graph_estimator.py:45-56)."""
    def ids_fn(view, key, n):
        return sampling.sample_graph_label(view, key, n)
    return ids_fn


def param_specs(params_or_abs):
    """PartitionSpec prefix tree for a params pytree: boxed leaves
    (``nn.with_partitioning`` — e.g. layers.ShardedEmbedding's table)
    keep their axes, everything else is replicated P()."""
    import flax.linen as nn

    specs = nn.get_partition_spec(params_or_abs)
    return jax.tree_util.tree_map(
        lambda s: s if isinstance(s, P) else P(), specs,
        is_leaf=lambda x: isinstance(x, P))


def _sync_grads(grads):
    """Cross-device gradient combine, partition-aware: replicated leaves
    pmean over the whole mesh; sharded leaves (nn.Partitioned boxes)
    pmean only over the axes they are NOT split on — each shard owns its
    rows' gradient (the PS of the reference's partitioned embeddings)."""
    import flax.linen as nn

    def sync(gr):
        if isinstance(gr, nn.Partitioned):
            used = {a for a in jax.tree_util.tree_leaves(gr.names)
                    if isinstance(a, str)}
            axes = tuple(a for a in ("data", "graph") if a not in used)
            val = comms.pmean(gr.unbox(), axes) if axes else gr.unbox()
            return gr.replace_boxed(val)
        return comms.pmean(gr, ("data", "graph"))

    return jax.tree_util.tree_map(
        sync, grads, is_leaf=lambda x: isinstance(x, nn.Partitioned))


def _local_batch(view, key, ids_fn, expand_fn, batch_per_device, S):
    """One device's model input + sample key inside shard_map."""
    di = jax.lax.axis_index("data")
    gi = jax.lax.axis_index("graph")
    # the whole graph-group shares one draw (collective owner combine
    # needs identical queries), then each member takes a slice
    kroots, ksample = jax.random.split(jax.random.fold_in(key, di))
    ids_all = ids_fn(view, kroots, batch_per_device * S)
    ids = jax.lax.dynamic_slice_in_dim(ids_all, gi * batch_per_device,
                                       batch_per_device, axis=0)
    batch = expand_fn(view, ids) if expand_fn is not None else ids
    return batch, jax.random.fold_in(ksample, gi)


def make_sharded_train_step(model, sg: ShardedGraphTensors,
                            tx: optax.GradientTransformation, mesh: Mesh,
                            batch_per_device: int, node_type=-1,
                            ids_fn: Optional[Callable] = None,
                            expand_fn: Optional[Callable] = None,
                            steps_per_loop: int = 1,
                            pspecs=None, mutable=(), sspecs=None):
    """Returns jitted ``step(params, opt_state, sg, key) ->
    (params, opt_state, loss)`` — or, with ``mutable`` collections
    (e.g. ScalableGNNNet's 'cache'), ``step(params, state, opt_state,
    sg, key) -> (params, state, opt_state, loss)`` where ``state`` is
    the non-trainable collections dict with specs ``sspecs``.

    Layout: params/opt_state replicated (sharded-table leaves follow
    ``pspecs``); graph arrays P('graph'); each device trains on
    ``batch_per_device`` roots (global batch = batch_per_device *
    n_devices). ``steps_per_loop > 1`` scans that many optimizer steps
    inside ONE device program (the estimator's steps_per_loop semantics
    — amortizes host->device dispatch, the tunneled-TPU analog of the
    reference's per-batch RPC overhead).
    """
    S = sg.num_shards
    gspecs = shard_specs(sg)
    if ids_fn is None:
        ids_fn = node_ids_fn(node_type)
    ps = P() if pspecs is None else pspecs
    mutable = list(mutable)
    ss = P() if sspecs is None else sspecs

    def local_loss(params, state, sg_block, key):
        view = to_view(sg_block, "graph")
        batch, ksample = _local_batch(view, key, ids_fn, expand_fn,
                                      batch_per_device, S)
        if mutable:
            out, new_state = model.apply(
                {"params": params, **state}, view, batch,
                rngs={"sample": ksample}, mutable=mutable)
        else:
            # legacy stateless contract: ``params`` IS the full
            # variables dict (what init_sharded_params returns)
            out = model.apply(params, view, batch,
                              rngs={"sample": ksample})
            new_state = state
        return out["loss"], new_state

    def sharded_step(params, state, opt_state, sg_in, key):
        def lossfn(p, st, blk, k):
            loss, new_state = local_loss(p, st, blk, k)
            return comms.pmean(loss, ("data", "graph")), new_state

        def grad_body(p, st, blk, k):
            (loss, new_state), grads = jax.value_and_grad(
                lossfn, has_aux=True)(p, st, blk, k)
            return loss, new_state, _sync_grads(grads)

        loss, new_state, grads = jax.shard_map(
            grad_body, mesh=mesh,
            in_specs=(ps, ss, gspecs, P()),
            out_specs=(P(), ss, ps),
            check_vma=False,
        )(params, state, sg_in, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state,
                opt_state, loss)

    def run_loop(params, state, opt_state, sg_in, key):
        def body(carry, i):
            p, st, o = carry
            p, st, o, loss = sharded_step(p, st, o, sg_in,
                                          jax.random.fold_in(key, i))
            return (p, st, o), loss

        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state),
            jnp.arange(steps_per_loop, dtype=jnp.int32))
        return params, state, opt_state, losses[-1]

    inner = sharded_step if steps_per_loop <= 1 else run_loop
    if mutable:
        return jax.jit(inner, donate_argnums=(0, 1, 2))

    # stateless models keep the historical 4-arg signature
    def stateless(params, opt_state, sg_in, key):
        p, _, o, loss = inner(params, {}, opt_state, sg_in, key)
        return p, o, loss

    return jax.jit(stateless, donate_argnums=(0, 1))


def init_sharded_params(model, sg: ShardedGraphTensors, mesh: Mesh,
                        batch_per_device: int, seed: int = 0,
                        node_type=-1, ids_fn: Optional[Callable] = None,
                        expand_fn: Optional[Callable] = None):
    """Initialize params by running the model once inside shard_map.

    Two-phase: an abstract pass discovers the param tree (including any
    ``nn.with_partitioning`` boxes of sharded tables) so the real init
    can declare per-leaf out_specs — sharded leaves reassemble along
    'graph', everything else replicates.
    """
    S = sg.num_shards
    gspecs = shard_specs(sg)
    if ids_fn is None:
        ids_fn = node_ids_fn(node_type)

    def init_body(sg_block, key):
        view = to_view(sg_block, "graph")
        batch, ksample = _local_batch(view, key, ids_fn, expand_fn,
                                      batch_per_device, S)
        params = model.init({"params": key, "sample": ksample}, view,
                            batch)
        return params

    def init_sm(out_specs):
        return jax.shard_map(init_body, mesh=mesh,
                             in_specs=(gspecs, P()),
                             out_specs=out_specs, check_vma=False)

    key = jax.random.PRNGKey(seed)
    with mesh:
        abs_out = jax.eval_shape(init_sm(P()), sg, key)
        pspecs = param_specs(abs_out)
        params = jax.jit(init_sm(pspecs))(sg, key)
    return params


def make_sharded_apply(model, sg: ShardedGraphTensors, mesh: Mesh,
                       expand_fn: Optional[Callable] = None,
                       pspecs=None, split_batch: bool = True):
    """Jitted sharded evaluate/infer apply:
    ``fn(sg, params, batch, key) -> out dict``.

    With ``split_batch`` (default) the batch's leading dim is split
    across ALL mesh devices (row order preserved: device di*S+gi takes
    slice idx) — each device evaluates its slice, array outputs
    reassemble along ('data','graph') and scalar outputs (losses) come
    back pmean'd, so eval/infer scale with the mesh like training does
    AND per-device batch shapes match the training configuration (graph
    models size their pooling to the per-device slice).
    ``split_batch=False`` keeps the replicated-batch behavior."""
    import jax.numpy as jnp

    S = sg.num_shards
    n_dev = mesh.shape["data"] * S
    gspecs = shard_specs(sg)
    ps = P() if pspecs is None else pspecs

    def body(sg_block, params, batch, key):
        view = to_view(sg_block, "graph")
        if split_batch:
            di = jax.lax.axis_index("data")
            gi = jax.lax.axis_index("graph")
            idx = di * S + gi
            bpd = batch.shape[0] // n_dev
            batch = jax.lax.dynamic_slice_in_dim(batch, idx * bpd, bpd,
                                                 axis=0)
            key = jax.random.fold_in(key, idx)
        if expand_fn is not None:
            batch = expand_fn(view, batch)
        mut = [k for k in params if k != "params"]
        if mut:   # cache-carrying models: discard updates in eval
            out, _ = model.apply(params, view, batch,
                                 rngs={"sample": key}, mutable=mut)
        else:
            out = model.apply(params, view, batch, rngs={"sample": key})
        if split_batch:
            out = {k: comms.pmean(v, ("data", "graph"))
                   if jnp.ndim(v) == 0 else v for k, v in out.items()}
        return out

    if not split_batch:
        return jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(gspecs, ps, P(), P()),
            out_specs=P(), check_vma=False))

    cache = {}

    def fn(sg_in, params, batch, key):
        shape_key = (batch.shape, str(batch.dtype))
        if shape_key not in cache:
            abs_out = jax.eval_shape(jax.shard_map(
                body, mesh=mesh, in_specs=(gspecs, ps, P(), P()),
                out_specs=P(), check_vma=False), sg_in, params, batch,
                key)
            out_specs = jax.tree_util.tree_map(
                lambda a: P() if len(a.shape) == 0
                else P(("data", "graph")), abs_out)
            cache[shape_key] = jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=(gspecs, ps, P(), P()),
                out_specs=out_specs, check_vma=False))
        return cache[shape_key](sg_in, params, batch, key)

    return fn


def place_sharded_graph(sg: ShardedGraphTensors, mesh: Mesh):
    """device_put the stacked arrays with their PartitionSpecs."""
    specs = shard_specs(sg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), sg, specs)
