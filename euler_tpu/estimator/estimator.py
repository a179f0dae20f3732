"""Training/eval/inference loops.

TPU-native counterpart of the reference's estimator layer
(reference: euler_estimator/python/base_estimator.py:28-188 — train /
evaluate / infer / train_and_evaluate on tf.estimator with model_dir
checkpointing; node_estimator.py:26, edge_estimator.py:27).

Re-design: the tf.estimator machinery collapses to a jitted train step +
optax optimizer + orbax checkpointing. The model is any flax module whose
``__call__(g, batch)`` returns a dict with at least ``loss``; batch sources
(sampled nodes / edges / id files) are provided by the subclasses exactly
like the reference's get_train_from_input hooks.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from euler_tpu.graph.store import Graph
from euler_tpu.ops import feature_ops, sampling
from euler_tpu.utils import metrics as metrics_lib


def get_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """reference: tf_euler/python/utils/optimizers.py:23-31."""
    return {
        "sgd": lambda: optax.sgd(lr),
        "momentum": lambda: optax.sgd(lr, momentum=0.9),
        "adagrad": lambda: optax.adagrad(lr),
        "adam": lambda: optax.adam(lr),
    }[name]()


@dataclasses.dataclass
class RunConfig:
    model_dir: str = "/tmp/euler_tpu_model"
    batch_size: int = 512
    total_steps: int = 1000
    optimizer: str = "adam"
    learning_rate: float = 0.01
    log_steps: int = 100
    save_steps: int = 0          # 0 => only at end
    keep_checkpoints: int = 5    # retain the newest N step dirs (the
    # tf.estimator default the reference inherits via model_dir)
    seed: int = 0
    metric: str = "f1"
    profile: bool = False        # jax.profiler trace of steps 10-20
    profile_dir: str = "prof_dir"  # (reference: ProfilerHook
    # base_estimator.py:130-134)
    steps_per_loop: int = 1      # >1: lax.scan that many optimizer steps
    # inside one device program. Amortizes host->device dispatch (the
    # tunneled-TPU analog of the reference's per-batch RPC overhead);
    # log/save/profile granularity rounds to loop boundaries.
    reservoir_refresh: int = 100  # redraw the fan_pack reservoir rows
    # every N steps (0 = never). Groups with degree > FAN_D hold a
    # reservoir of pre-drawn neighbors; per-draw marginals are exact but
    # draws repeat the reservoir until refreshed, so without this long
    # runs would see only <= FAN_D distinct neighbors per high-degree
    # node (ops/alias.py FAN_* layout, ops/sampling.refresh_fan_pack).


class BaseEstimator:
    """Generic run loops; subclasses provide the batch source."""

    def __init__(self, model, graph: Graph, config: RunConfig):
        self.model = model
        self.graph = graph
        self.config = config
        self.tx = get_optimizer(config.optimizer, config.learning_rate)
        self._params = None
        self._train_step = None

    # ---- batch sources (subclass hooks) -----------------------------------
    def train_batch(self, g, key):
        """Return the per-step model input (traced)."""
        raise NotImplementedError

    # ---- param init / checkpointing ---------------------------------------
    def _init_params(self, key):
        g = self.graph.tensors
        model, batch_fn = self.model, self.train_batch

        # jit the whole init: eager flax init dispatches every traced op
        # individually (very slow on remote/tunneled accelerators)
        @jax.jit
        def init(g, key):
            kp, ks, kb = jax.random.split(key, 3)
            return model.init({"params": kp, "sample": ks}, g,
                              batch_fn(g, kb))

        return init(g, key)

    @property
    def params(self):
        if self._params is None:
            self._params = self._restore() or self._init_params(
                jax.random.PRNGKey(self.config.seed))
        return self._params

    def _split_vars(self):
        """(trainable params, non-trainable state collections).

        Models with mutable collections (e.g. the ``cache`` stores of
        scalable.ScalableGNNNet) keep those out of the optimizer —
        the reference marks its stores non-trainable LOCAL_VARIABLES
        (encoders.py:314-327)."""
        variables = dict(self.params)
        p = variables.pop("params", {})
        return p, variables

    def _merge_vars(self, p, state):
        return {"params": p, **state}

    def _ckpt_dir(self):
        return os.path.join(os.path.abspath(self.config.model_dir), "ckpt")

    def _save(self, step):
        try:
            import orbax.checkpoint as ocp
            path = os.path.join(self._ckpt_dir(), str(step))
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, self._params, force=True)
            ckptr.wait_until_finished()
            with open(os.path.join(self._ckpt_dir(), "latest"), "w") as f:
                f.write(str(step))
            keep = getattr(self.config, "keep_checkpoints", 0)
            if keep > 0:
                import shutil
                steps = sorted((int(d) for d in os.listdir(self._ckpt_dir())
                                if d.isdigit()), reverse=True)
                for old in steps[keep:]:
                    shutil.rmtree(os.path.join(self._ckpt_dir(), str(old)),
                                  ignore_errors=True)
        except Exception as e:  # pragma: no cover
            print(f"[euler_tpu] checkpoint save failed: {e}")

    def _restore(self):
        try:
            import orbax.checkpoint as ocp
            latest = os.path.join(self._ckpt_dir(), "latest")
            if not os.path.exists(latest):
                return None
            with open(latest) as f:
                step = f.read().strip()
            path = os.path.join(self._ckpt_dir(), step)
            ref = self._init_params(jax.random.PRNGKey(self.config.seed))
            return ocp.StandardCheckpointer().restore(path, ref)
        except Exception:
            return None

    # ---- loops -------------------------------------------------------------
    def train(self, total_steps: Optional[int] = None,
              log_fn: Callable = print) -> Dict[str, float]:
        cfg = self.config
        total = total_steps or cfg.total_steps
        g = self.graph.tensors
        params, state = self._split_vars()
        mutable = list(state.keys())
        opt_state = self.tx.init(params)

        model, tx, batch_fn = self.model, self.tx, self.train_batch

        # NB: the graph is a jit *argument*, never a closure — closure
        # capture turns the multi-GB store into program constants, which
        # wrecks both compile time and dispatch (see .claude/skills/verify).
        @jax.jit
        def step(g, params, state, opt_state, key):
            kb, ks = jax.random.split(key)
            batch = batch_fn(g, kb)

            def loss_fn(p):
                if mutable:
                    out, new_state = model.apply(
                        {"params": p, **state}, g, batch,
                        rngs={"sample": ks}, mutable=mutable)
                else:
                    out = model.apply({"params": p, **state}, g, batch,
                                      rngs={"sample": ks})
                    new_state = state
                return out["loss"], (out, new_state)

            (loss, (out, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_state,
                    opt_state2, loss)

        spl = max(1, int(cfg.steps_per_loop))

        @jax.jit
        def run_loop(g, params, state, opt_state, key):
            def body(carry, i):
                params, state, opt_state = carry
                params, state, opt_state, loss = step(
                    g, params, state, opt_state, jax.random.fold_in(key, i))
                return (params, state, opt_state), loss

            (params, state, opt_state), losses = jax.lax.scan(
                body, (params, state, opt_state),
                jnp.arange(spl, dtype=jnp.int32))
            return params, state, opt_state, losses[-1]

        profiler = None
        if cfg.profile:
            from euler_tpu.utils.hooks import ProfilerHook
            profiler = ProfilerHook(cfg.profile_dir, start=10, steps=10)

        key = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.time()
        last_loss = float("nan")
        i = 0
        next_refresh = cfg.reservoir_refresh or float("inf")
        while i < total:
            if i >= next_refresh:
                key, kr = jax.random.split(key)
                g = sampling.refresh_fan_pack(g, kr)
                next_refresh += cfg.reservoir_refresh
            key, sub = jax.random.split(key)
            if spl > 1 and i + spl <= total:
                params, state, opt_state, loss = run_loop(
                    g, params, state, opt_state, sub)
                i += spl
            else:
                params, state, opt_state, loss = step(g, params, state,
                                                      opt_state, sub)
                i += 1
            if profiler is not None:
                profiler(i)
            if cfg.log_steps and i % max(cfg.log_steps, 1) < max(spl, 1):
                last_loss = float(loss)
                rate = i * cfg.batch_size / (time.time() - t0)
                log_fn(f"[euler_tpu] step {i}/{total} "
                       f"loss={last_loss:.4f} ({rate:.0f} ex/s)")
            if cfg.save_steps and i % cfg.save_steps < max(spl, 1) \
                    and i >= cfg.save_steps:
                self._params = self._merge_vars(params, state)
                self._save(i)
        if profiler is not None:
            profiler.close()
        # keep the refreshed reservoir visible to evaluate/infer and to
        # subsequent train() calls
        self.graph.tensors = g
        self._params = self._merge_vars(params, state)
        self._save(total)
        return {"loss": float(last_loss) if last_loss == last_loss
                else float(loss), "steps": total}

    def _batched_apply(self, ids: np.ndarray, fn):
        """Pad ids to batch multiples, run jitted fn, strip padding."""
        cfg = self.config
        B = cfg.batch_size
        n = len(ids)
        pad = (-n) % B
        pad_block = np.full((pad,) + ids.shape[1:], -1, ids.dtype)
        padded = np.concatenate([ids, pad_block])
        outs = []
        key = jax.random.PRNGKey(cfg.seed + 2)
        g = self.graph.tensors
        for i in range(0, len(padded), B):
            key, sub = jax.random.split(key)
            outs.append(fn(g, self.params, jnp.asarray(padded[i:i + B]),
                           sub))
        return outs, n

    def evaluate(self, ids: Sequence[int]) -> Dict[str, float]:
        g = self.graph.tensors
        model = self.model
        metric_name = self.config.metric
        metric = metrics_lib.get(metric_name)

        mutable = [k for k in self.params if k != "params"]

        @jax.jit
        def eval_fn(g, params, batch, key):
            if mutable:   # cache-carrying models; discard updates in eval
                out, _ = model.apply(params, g, batch,
                                     rngs={"sample": key}, mutable=mutable)
            else:
                out = model.apply(params, g, batch, rngs={"sample": key})
            return out

        ids = np.asarray(ids, np.int32)
        if ids.ndim == 1 and isinstance(self, EdgeEstimator):
            raise ValueError(
                "EdgeEstimator.evaluate needs [T,3] (src,dst,etype) test "
                "triples, not node ids (the reference evaluates from "
                "triple id files); use sample_edge to build a triple set "
                "or evaluate_ranking for full-entity MR/Hit@k")
        outs, n = self._batched_apply(ids, eval_fn)
        # supervised: f1/acc from logits+labels; unsupervised: mrr
        if "logit" in outs[0]:
            logits = np.concatenate([np.asarray(o["logit"]) for o in outs])
            labels = np.concatenate([np.asarray(o["label"]) for o in outs])
            logits, labels = logits[:n], labels[:n]
            if metric_name in ("f1",):
                val = metric(jnp.asarray(labels),
                             jax.nn.sigmoid(jnp.asarray(logits)))
            else:
                val = metric(jnp.asarray(labels), jnp.asarray(logits))
        else:
            pos = np.concatenate([np.asarray(o["logits"]) for o in outs])[:n]
            neg = np.concatenate(
                [np.asarray(o["neg_logits"]) for o in outs])[:n]
            val = metric(jnp.asarray(pos), jnp.asarray(neg))
        loss = float(np.mean([float(o["loss"]) for o in outs]))
        return {metric_name: float(val), "loss": loss}

    def infer(self, ids: Sequence[int], out_dir: Optional[str] = None,
              worker: int = 0):
        """Embeddings for ids; optionally written as
        embedding_{worker}.npy + ids_{worker}.npy
        (reference: base_estimator.py:157-179)."""
        g = self.graph.tensors
        model = self.model

        mutable = [k for k in self.params if k != "params"]

        @jax.jit
        def embed_fn(g, params, batch, key):
            if mutable:
                out, _ = model.apply(params, g, batch,
                                     rngs={"sample": key}, mutable=mutable)
            else:
                out = model.apply(params, g, batch, rngs={"sample": key})
            return out["embedding"]

        ids = np.asarray(ids, np.int32)
        outs, n = self._batched_apply(ids, embed_fn)
        emb = np.concatenate([np.asarray(o) for o in outs])[:n]
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(out_dir, f"embedding_{worker}.npy"), emb)
            np.save(os.path.join(out_dir, f"ids_{worker}.npy"), ids)
        return emb

    def train_and_evaluate(self, eval_ids):
        res = self.train()
        res.update(self.evaluate(eval_ids))
        return res


class NodeEstimator(BaseEstimator):
    """Train source = sample_node(batch, node_type)
    (reference: node_estimator.py:31-51)."""

    def __init__(self, model, graph, config, train_node_type=-1):
        super().__init__(model, graph, config)
        self.train_node_type = train_node_type

    def train_batch(self, g, key):
        return sampling.sample_node(g, key, self.config.batch_size,
                                    self.train_node_type)


class EdgeEstimator(BaseEstimator):
    """Train source = sample_edge(batch, edge_type); the model receives
    (src, dst, etype) stacked [B,3] (reference: edge_estimator.py:32-72)."""

    def __init__(self, model, graph, config, train_edge_type=-1):
        super().__init__(model, graph, config)
        self.train_edge_type = train_edge_type

    def train_batch(self, g, key):
        src, dst, ty, _ = sampling.sample_edge(
            g, key, self.config.batch_size, self.train_edge_type)
        return jnp.stack([src, dst, ty], axis=1)

    def evaluate_ranking(self, triples, corrupt: str = "both",
                         filter_known=None, hit_ks=(1, 3, 10)
                         ) -> Dict[str, float]:
        """Full-entity ranking eval (MeanRank/MRR/Hit@k) of [T,3] test
        triples — the protocol behind the reference's FB15k result table
        (examples/TransX/README.md). Requires a TransX-family model."""
        from euler_tpu.models.kg import rank_all_entities
        return rank_all_entities(self.model, self.params,
                                 self.graph.tensors, triples,
                                 batch_size=self.config.batch_size,
                                 corrupt=corrupt, filter_known=filter_known,
                                 hit_ks=hit_ks)


class GaeEstimator(NodeEstimator):
    """Autoencoder runs: node-sampled training plus id-file evaluation
    inputs (reference: euler_estimator/python/gae_estimator.py —
    sample_node train source, TextLineDataset id file for eval/infer).
    Pair with GAE/VGAE/DGI models (models.autoencoders)."""

    @staticmethod
    def ids_from_file(path):
        """One integer id per line -> int array (the reference's
        get_input_from_id_file)."""
        return np.loadtxt(path, dtype=np.int64).reshape(-1)

    def evaluate_id_file(self, path):
        return self.evaluate(self.ids_from_file(path))

    def infer_id_file(self, path, out_dir=None):
        return self.infer(self.ids_from_file(path), out_dir)


class SampleEstimator(BaseEstimator):
    """Training from PRECOMPUTED samples instead of on-graph sampling
    (reference: euler_estimator/python/sample_estimator.py —
    TextLineDataset of comma-separated sample rows, batched+repeated).

    ``samples``: [M, K] int array or a path to a text file with K
    comma-separated ints per line. Each step draws ``batch_size`` rows
    uniformly with replacement (the shuffled-repeat epoch stream of the
    reference, shapes static under jit); single-column files feed the
    model as flat id batches. The table rides inside the compiled
    program — suited to sample files up to a few hundred MB.
    """

    def __init__(self, model, graph, config, samples):
        super().__init__(model, graph, config)
        if isinstance(samples, str):
            samples = np.loadtxt(samples, delimiter=",", dtype=np.int64,
                                 ndmin=2)
        samples = np.asarray(samples)
        if samples.ndim == 1:
            samples = samples[:, None]
        if not len(samples):
            raise ValueError("empty sample set")
        self._samples = jnp.asarray(samples, jnp.int32)

    def train_batch(self, g, key):
        tab = self._samples
        idx = jax.random.randint(key, (self.config.batch_size,), 0,
                                 tab.shape[0])
        rows = tab[idx]
        return rows[:, 0] if rows.shape[1] == 1 else rows


def make_graph_batch(g, graph_idx, label_name, num_classes):
    """Graph-classification model input from graph indices: membership
    block + one-hot labels from the first member node's dense feature
    (reference: graph_estimator.py:45-56). Works on both the single-chip
    tensors and a sharded mesh view (the feature fetch dispatches)."""
    members, mask, node_graph_idx = sampling.get_graph_by_label(
        g, graph_idx)
    first = members[:, 0]
    (lab,) = feature_ops.get_dense_feature(g, first, [label_name])
    label = jax.nn.one_hot(lab[:, 0].astype(jnp.int32), num_classes)
    label = jnp.where((graph_idx >= 0)[:, None], label, 0.0)
    return dict(node_ids=members.reshape(-1),
                mask=mask.reshape(-1) & (graph_idx >= 0).repeat(
                    members.shape[1]),
                node_graph_idx=node_graph_idx,
                label=label)


class GraphEstimator(BaseEstimator):
    """Graph-classification loops: sample_graph_label ->
    get_graph_by_label -> one-hot labels from the first member node's
    ``label_name`` dense feature
    (reference: euler_estimator/python/graph_estimator.py:32-77)."""

    def __init__(self, model, graph, config, label_name="label",
                 num_classes=2):
        super().__init__(model, graph, config)
        self.label_name = label_name
        self.num_classes = num_classes

    def _make_batch(self, g, graph_idx):
        return make_graph_batch(g, graph_idx, self.label_name,
                                self.num_classes)

    def train_batch(self, g, key):
        gidx = sampling.sample_graph_label(g, key, self.config.batch_size)
        return self._make_batch(g, gidx)

    def evaluate(self, graph_ids) -> Dict[str, float]:
        g = self.graph.tensors
        model = self.model

        @jax.jit
        def eval_fn(g, params, gidx, key):
            batch = self._make_batch(g, gidx)
            return model.apply(params, g, batch, rngs={"sample": key})

        ids = np.asarray(graph_ids, np.int32)
        outs, n = self._batched_apply(ids, eval_fn)
        logits = np.concatenate([np.asarray(o["logit"]) for o in outs])[:n]
        labels = np.concatenate([np.asarray(o["label"]) for o in outs])[:n]
        acc = metrics_lib.accuracy(jnp.asarray(labels), jnp.asarray(logits))
        return {"accuracy": float(acc),
                "loss": float(np.mean([float(o["loss"]) for o in outs]))}

    def infer(self, graph_ids, out_dir=None, worker=0):
        g = self.graph.tensors
        model = self.model

        @jax.jit
        def embed_fn(g, params, gidx, key):
            batch = self._make_batch(g, gidx)
            out = model.apply(params, g, batch, rngs={"sample": key})
            return out["embedding"]

        ids = np.asarray(graph_ids, np.int32)
        outs, n = self._batched_apply(ids, embed_fn)
        emb = np.concatenate([np.asarray(o) for o in outs])[:n]
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(out_dir, f"embedding_{worker}.npy"), emb)
            np.save(os.path.join(out_dir, f"ids_{worker}.npy"), ids)
        return emb
