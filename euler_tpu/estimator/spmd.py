"""Mesh-parallel estimator: the single-chip estimator API over a
(data, graph) device mesh.

TPU-native counterpart of the reference's distributed training deployment
(reference: between-graph TF replication + PS variables dist_tf_euler.sh /
base_estimator.py:164-166, with graph lookups served by N shard servers,
grpc_server.cc). Here the whole thing is ONE jitted SPMD program: graph
shards live in device memory with PartitionSpec('graph'), roots are
data-parallel, parameters replicated, gradients pmean'd — built from
parallel.train's shard_map step and surfaced with the same
train/evaluate/infer ergonomics as BaseEstimator.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from euler_tpu.estimator.estimator import RunConfig, get_optimizer
from euler_tpu.graph.store import Graph
from euler_tpu.parallel import mesh as mesh_lib
from euler_tpu.parallel import sharded as sharded_lib
from euler_tpu.parallel import train as train_lib
from euler_tpu.utils import metrics as metrics_lib
from jax.sharding import PartitionSpec as P


class SpmdNodeEstimator:
    """Node-model training over a device mesh.

    ``graph`` may be a single-chip Graph (re-partitioned onto
    ``graph_shards`` shards here) or an already-built ShardedGraphTensors
    (e.g. from parallel.distributed.load_graph_sharded for multi-host).
    ``batch_size`` is the GLOBAL batch; it must divide by the data-axis
    size.
    """

    def __init__(self, model, graph, config: RunConfig,
                 train_node_type=-1, mesh=None, graph_shards: int = 0):
        self.model = model
        self.config = config
        self.train_node_type = train_node_type
        n_dev = len(jax.devices())
        if mesh is None:
            gs = graph_shards or n_dev
            mesh = mesh_lib.make_mesh(data=n_dev // gs, graph=gs)
        self.mesh = mesh
        S = mesh.shape["graph"]
        if isinstance(graph, Graph):
            sg = sharded_lib.build_sharded(graph, S)
        else:
            sg = graph
        if sg.num_shards != S:
            raise ValueError(f"graph has {sg.num_shards} shards; mesh "
                             f"graph axis is {S}")
        self.sg = train_lib.place_sharded_graph(sg, mesh)
        self.tx = get_optimizer(config.optimizer, config.learning_rate)
        data = mesh.shape["data"]
        if config.batch_size % data:
            raise ValueError(f"global batch {config.batch_size} must "
                             f"divide by data-axis size {data}")
        self.batch_per_device = config.batch_size // data
        self._params = None

    @property
    def params(self):
        if self._params is None:
            self._params = train_lib.init_sharded_params(
                self.model, self.sg, self.mesh, self.batch_per_device,
                seed=self.config.seed, node_type=self.train_node_type)
        return self._params

    def train(self, total_steps: Optional[int] = None,
              log_fn=print) -> Dict[str, float]:
        cfg = self.config
        total = total_steps or cfg.total_steps
        step = train_lib.make_sharded_train_step(
            self.model, self.sg, self.tx, self.mesh,
            self.batch_per_device, node_type=self.train_node_type)
        params = self.params
        opt_state = self.tx.init(params)
        key = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.time()
        loss = jnp.float32(0)
        with self.mesh:
            for i in range(1, total + 1):
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state,
                                               self.sg, sub)
                if cfg.log_steps and i % cfg.log_steps == 0:
                    rate = i * cfg.batch_size / (time.time() - t0)
                    log_fn(f"[euler_tpu] spmd step {i}/{total} "
                           f"loss={float(loss):.4f} ({rate:.0f} ex/s)")
        self._params = params
        return {"loss": float(loss), "steps": total}

    def _apply_fn(self):
        model = self.model
        gspecs = sharded_lib.shard_specs(self.sg)

        def body(sg_block, params, batch, key):
            view = sharded_lib.to_view(sg_block, "graph")
            return model.apply(params, view, batch, rngs={"sample": key})

        return jax.jit(jax.shard_map(
            body, mesh=self.mesh, in_specs=(gspecs, P(), P(), P()),
            out_specs=P(), check_vma=False))

    def evaluate(self, ids: Sequence[int]) -> Dict[str, float]:
        cfg = self.config
        metric = metrics_lib.get(cfg.metric)
        fn = self._apply_fn()
        ids = np.asarray(ids, np.int32)
        B = cfg.batch_size
        pad = (-len(ids)) % B
        padded = np.concatenate([ids, np.full(pad, -1, np.int32)])
        outs = []
        key = jax.random.PRNGKey(cfg.seed + 2)
        with self.mesh:
            for i in range(0, len(padded), B):
                key, sub = jax.random.split(key)
                outs.append(fn(self.sg, self.params,
                               jnp.asarray(padded[i:i + B]), sub))
        logits = np.concatenate(
            [np.asarray(o["logit"]) for o in outs])[:len(ids)]
        labels = np.concatenate(
            [np.asarray(o["label"]) for o in outs])[:len(ids)]
        if cfg.metric == "f1":
            val = metric(jnp.asarray(labels),
                         jax.nn.sigmoid(jnp.asarray(logits)))
        else:
            val = metric(jnp.asarray(labels), jnp.asarray(logits))
        loss = float(np.mean([float(o["loss"]) for o in outs]))
        return {cfg.metric: float(val), "loss": loss}

    def infer(self, ids: Sequence[int], out_dir: Optional[str] = None,
              worker: int = 0):
        cfg = self.config
        fn = self._apply_fn()
        ids = np.asarray(ids, np.int32)
        B = cfg.batch_size
        pad = (-len(ids)) % B
        padded = np.concatenate([ids, np.full(pad, -1, np.int32)])
        outs = []
        key = jax.random.PRNGKey(cfg.seed + 2)
        with self.mesh:
            for i in range(0, len(padded), B):
                key, sub = jax.random.split(key)
                outs.append(np.asarray(fn(
                    self.sg, self.params, jnp.asarray(padded[i:i + B]),
                    sub)["embedding"]))
        emb = np.concatenate(outs)[:len(ids)]
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(out_dir, f"embedding_{worker}.npy"), emb)
            np.save(os.path.join(out_dir, f"ids_{worker}.npy"), ids)
        return emb

    def train_and_evaluate(self, eval_ids):
        res = self.train()
        res.update(self.evaluate(eval_ids))
        return res
