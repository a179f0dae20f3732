"""Mesh-parallel estimators: the single-chip estimator API over a
(data, graph) device mesh.

TPU-native counterpart of the reference's distributed training deployment
(reference: between-graph TF replication + PS variables dist_tf_euler.sh /
base_estimator.py:164-166, with graph lookups served by N shard servers,
grpc_server.cc). Here the whole thing is ONE jitted SPMD program: graph
shards live in device memory with PartitionSpec('graph'), batches are
data-parallel, parameters replicated, gradients pmean'd — built from
parallel.train's shard_map step and surfaced with the full estimator
contract: checkpointing (orbax, save_steps/restore), steps_per_loop
on-device scan, reservoir refresh (the sharded fan-pack redraw), and
evaluate/infer with pad-row exclusion.

Node / Edge / Graph variants mirror euler_estimator's
node_estimator.py:26 / edge_estimator.py:27 / graph_estimator.py:26.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from euler_tpu.estimator.estimator import (BaseEstimator, RunConfig,
                                           get_optimizer, make_graph_batch)
from euler_tpu.graph.store import Graph
from euler_tpu.parallel import mesh as mesh_lib
from euler_tpu.parallel import sharded as sharded_lib
from euler_tpu.parallel import train as train_lib
from euler_tpu.utils import metrics as metrics_lib


class SpmdEstimator(BaseEstimator):
    """Shared mesh-estimator machinery; subclasses provide the batch
    hooks (``_ids_fn`` / ``_expand_fn``).

    ``graph`` may be a single-chip Graph (re-partitioned onto
    ``graph_shards`` shards here) or an already-built ShardedGraphTensors
    (e.g. from parallel.distributed.load_graph_sharded for multi-host).
    ``batch_size`` is the GLOBAL batch; it must divide by the number of
    devices.
    """

    def __init__(self, model, graph, config: RunConfig, mesh=None,
                 graph_shards: int = 0):
        self.model = model
        self.config = config
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
        n_mesh = mesh.shape["data"] * S
        if config.batch_size % n_mesh:
            raise ValueError(f"global batch {config.batch_size} must "
                             f"divide by the device count {n_mesh}")
        self.batch_per_device = config.batch_size // n_mesh
        self._params = None

    # ---- batch hooks (subclass contract) ----------------------------------
    def _ids_fn(self):
        raise NotImplementedError

    def _expand_fn(self):
        return None

    # ---- params / checkpointing (orbax helpers inherited) ------------------
    def _init_params(self, key=None):
        params = train_lib.init_sharded_params(
            self.model, self.sg, self.mesh, self.batch_per_device,
            seed=self.config.seed, ids_fn=self._ids_fn(),
            expand_fn=self._expand_fn())
        return params

    @property
    def pspecs(self):
        """PartitionSpec prefix tree of the params: P('graph', ...) for
        sharded embedding tables (layers.ShardedEmbedding), P() for
        replicated leaves."""
        return train_lib.param_specs(self.params)

    def train(self, total_steps: Optional[int] = None,
              log_fn=print) -> Dict[str, float]:
        cfg = self.config
        total = total_steps or cfg.total_steps
        spl = max(1, int(cfg.steps_per_loop))
        variables = dict(self.params)
        mutable = [k for k in variables if k != "params"]
        full_specs = self.pspecs
        if mutable:
            params = variables.pop("params", {})
            state = variables               # mutable collections
            ps = full_specs.get("params", None)
            ss = {k: v for k, v in full_specs.items() if k != "params"}
        else:
            params = self.params            # full variables (legacy)
            state = {}
            ps, ss = full_specs, None
        kw = dict(ids_fn=self._ids_fn(), expand_fn=self._expand_fn(),
                  pspecs=ps, mutable=mutable, sspecs=ss)
        step = train_lib.make_sharded_train_step(
            self.model, self.sg, self.tx, self.mesh,
            self.batch_per_device, **kw)
        loop = step if spl == 1 else train_lib.make_sharded_train_step(
            self.model, self.sg, self.tx, self.mesh,
            self.batch_per_device, steps_per_loop=spl, **kw)
        opt_state = self.tx.init(params)
        key = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.time()
        loss = jnp.float32(float("nan"))
        i = 0
        next_refresh = cfg.reservoir_refresh or float("inf")

        def run(fn, sub):
            nonlocal params, state, opt_state, loss
            if mutable:
                params, state, opt_state, loss = fn(params, state,
                                                    opt_state, self.sg,
                                                    sub)
            else:
                params, opt_state, loss = fn(params, opt_state, self.sg,
                                             sub)

        with self.mesh:
            while i < total:
                if i >= next_refresh:
                    key, kr = jax.random.split(key)
                    self.sg = sharded_lib.refresh_fan_pack_sharded(
                        self.sg, self.mesh, kr)
                    next_refresh += cfg.reservoir_refresh
                key, sub = jax.random.split(key)
                if spl > 1 and i + spl <= total:
                    run(loop, sub)
                    i += spl
                else:
                    run(step, sub)
                    i += 1
                if cfg.log_steps and i % max(cfg.log_steps, 1) < spl:
                    rate = i * cfg.batch_size / (time.time() - t0)
                    log_fn(f"[euler_tpu] spmd step {i}/{total} "
                           f"loss={float(loss):.4f} ({rate:.0f} ex/s)")
                if cfg.save_steps and i % cfg.save_steps < spl \
                        and i >= cfg.save_steps:
                    self._params = {"params": params, **state} \
                        if mutable else params
                    self._save(i)
        self._params = {"params": params, **state} if mutable else params
        self._save(total)
        return {"loss": float(loss), "steps": total}

    def _batched_outs(self, ids: np.ndarray):
        """Run the replicated apply over padded batches; returns
        (outs list, n valid, per-batch valid counts)."""
        cfg = self.config
        fn = train_lib.make_sharded_apply(self.model, self.sg, self.mesh,
                                          expand_fn=self._expand_fn(),
                                          pspecs=self.pspecs)
        ids = np.asarray(ids, np.int32)
        B = cfg.batch_size
        n = len(ids)
        if n == 0:
            raise ValueError(
                "evaluate/infer called with an empty id sequence; pass at "
                "least one id (padding rows are added automatically)")
        pad = (-n) % B
        pad_block = np.full((pad,) + ids.shape[1:], -1, ids.dtype)
        padded = np.concatenate([ids, pad_block])
        outs, counts = [], []
        key = jax.random.PRNGKey(cfg.seed + 2)
        with self.mesh:
            for i in range(0, len(padded), B):
                key, sub = jax.random.split(key)
                chunk = padded[i:i + B]
                outs.append(fn(self.sg, self.params, jnp.asarray(chunk),
                               sub))
                first = chunk if chunk.ndim == 1 else chunk[:, 0]
                counts.append(int((first >= 0).sum()))
        return outs, n, counts

    @staticmethod
    def _mean_loss(outs, counts):
        # pad-row exclusion: weight each batch's loss by its valid rows
        num = sum(float(o["loss"]) * c for o, c in zip(outs, counts))
        den = max(1, sum(counts))
        return num / den

    def evaluate(self, ids: Sequence[int]) -> Dict[str, float]:
        cfg = self.config
        metric = metrics_lib.get(cfg.metric)
        outs, n, counts = self._batched_outs(ids)
        if "logit" in outs[0]:
            logits = np.concatenate(
                [np.asarray(o["logit"]) for o in outs])[:n]
            labels = np.concatenate(
                [np.asarray(o["label"]) for o in outs])[:n]
            if cfg.metric == "f1":
                val = metric(jnp.asarray(labels),
                             jax.nn.sigmoid(jnp.asarray(logits)))
            else:
                val = metric(jnp.asarray(labels), jnp.asarray(logits))
        else:
            pos = np.concatenate(
                [np.asarray(o["logits"]) for o in outs])[:n]
            neg = np.concatenate(
                [np.asarray(o["neg_logits"]) for o in outs])[:n]
            val = metric(jnp.asarray(pos), jnp.asarray(neg))
        return {cfg.metric: float(val),
                "loss": self._mean_loss(outs, counts)}

    def infer(self, ids: Sequence[int], out_dir: Optional[str] = None,
              worker: int = 0):
        outs, n, _ = self._batched_outs(ids)
        emb = np.concatenate(
            [np.asarray(o["embedding"]) for o in outs])[:n]
        ids = np.asarray(ids, np.int32)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(out_dir, f"embedding_{worker}.npy"), emb)
            np.save(os.path.join(out_dir, f"ids_{worker}.npy"), ids)
        return emb


class SpmdNodeEstimator(SpmdEstimator):
    """Train source = sharded sample_node (node_estimator.py:31-51)."""

    def __init__(self, model, graph, config, train_node_type=-1,
                 mesh=None, graph_shards: int = 0):
        super().__init__(model, graph, config, mesh=mesh,
                         graph_shards=graph_shards)
        self.train_node_type = train_node_type

    def _ids_fn(self):
        return train_lib.node_ids_fn(self.train_node_type)


class SpmdEdgeEstimator(SpmdEstimator):
    """Train source = sharded sample_edge triples
    (edge_estimator.py:32-72); KG training (TransX/DistMult) multi-chip.
    """

    def __init__(self, model, graph, config, train_edge_type=-1,
                 mesh=None, graph_shards: int = 0):
        super().__init__(model, graph, config, mesh=mesh,
                         graph_shards=graph_shards)
        self.train_edge_type = train_edge_type

    def _ids_fn(self):
        return train_lib.edge_ids_fn(self.train_edge_type)

    def _batched_outs(self, ids):
        ids = np.asarray(ids, np.int32)
        if ids.ndim == 1:
            raise ValueError(
                "SpmdEdgeEstimator.evaluate needs [T,3] (src,dst,etype) "
                "test triples, not node ids (same contract as "
                "EdgeEstimator)")
        return super()._batched_outs(ids)

    def evaluate_ranking(self, triples, corrupt: str = "both",
                         filter_known=None, hit_ks=(1, 3, 10)):
        """Full-entity MR/MRR/Hit@k with mesh-trained params: the TransX
        ranking path is pure embedding compute (rank_against_all never
        reads the graph), so the replicated params evaluate directly
        (protocol of examples/TransX/README.md)."""
        from euler_tpu.models.kg import rank_all_entities
        return rank_all_entities(self.model, self.params, None, triples,
                                 batch_size=self.config.batch_size,
                                 corrupt=corrupt,
                                 filter_known=filter_known,
                                 hit_ks=hit_ks)


class SpmdGraphEstimator(SpmdEstimator):
    """Graph-classification over the mesh: replicated graph-label tables
    feed sharded feature/neighbor verbs (graph_estimator.py:32-77)."""

    def __init__(self, model, graph, config, label_name="label",
                 num_classes=2, mesh=None, graph_shards: int = 0):
        super().__init__(model, graph, config, mesh=mesh,
                         graph_shards=graph_shards)
        self.label_name = label_name
        self.num_classes = num_classes

    def _ids_fn(self):
        return train_lib.graph_ids_fn()

    def _expand_fn(self):
        label_name, num_classes = self.label_name, self.num_classes

        def expand(view, gidx):
            return make_graph_batch(view, gidx, label_name, num_classes)
        return expand

    def evaluate(self, graph_ids) -> Dict[str, float]:
        outs, n, counts = self._batched_outs(graph_ids)
        logits = np.concatenate(
            [np.asarray(o["logit"]) for o in outs])[:n]
        labels = np.concatenate(
            [np.asarray(o["label"]) for o in outs])[:n]
        acc = metrics_lib.accuracy(jnp.asarray(labels),
                                   jnp.asarray(logits))
        return {"accuracy": float(acc),
                "loss": self._mean_loss(outs, counts)}
