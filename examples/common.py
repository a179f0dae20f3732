"""Shared example runner.

TPU-native counterpart of the reference's per-example ``run_*.py`` mains
(reference: examples/gcn/run_gcn.py:45-89 — flags -> dataset.load_graph()
-> model -> NodeEstimator.train/evaluate/infer). Every example script
builds a model from euler_tpu pieces and hands it to ``run``.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from euler_tpu.datasets import get_dataset  # noqa: E402
from euler_tpu.estimator.estimator import (EdgeEstimator,  # noqa: E402
                                           GraphEstimator, NodeEstimator,
                                           RunConfig)
from euler_tpu.estimator.spmd import (SpmdEdgeEstimator,  # noqa: E402
                                      SpmdGraphEstimator,
                                      SpmdNodeEstimator)
from euler_tpu.utils.config import (apply_defaults,  # noqa: E402
                                    define_run_flags, parse_mesh_flag)


def _make_mesh(args):
    """None unless --mesh was given; else the (data, graph) Mesh."""
    if getattr(args, "mesh", None) is None:
        return None
    from euler_tpu.parallel import mesh as mesh_lib
    d, g = parse_mesh_flag(args.mesh)
    return mesh_lib.make_mesh(data=d, graph=g)


def parse_flags(argv=None, **defaults):
    p = define_run_flags()
    args = apply_defaults(p.parse_args(argv))
    for k, v in defaults.items():
        if getattr(args, k, None) in (None, p.get_default(k)):
            setattr(args, k, v)
    return args


def make_config(args, ds, metric="f1"):
    total = args.total_steps or max(
        1, (getattr(ds, "total_size", 0) + 1) // args.batch_size *
        args.num_epochs)
    return RunConfig(model_dir=args.model_dir,
                     batch_size=args.batch_size,
                     total_steps=total,
                     optimizer=args.optimizer,
                     learning_rate=args.learning_rate,
                     log_steps=args.log_steps,
                     metric=metric,
                     profile=args.profile)


def run_node_model(args, ds, graph, model, metric="f1",
                   train_node_type=None):
    cfg = make_config(args, ds, metric)
    tnt = train_node_type if train_node_type is not None \
        else ds.train_node_type
    if isinstance(tnt, str):
        tnt = graph.meta.node_type_id(tnt)
    mesh = _make_mesh(args)
    if mesh is not None:
        est = SpmdNodeEstimator(model, graph, cfg, train_node_type=tnt,
                                mesh=mesh)
    else:
        est = NodeEstimator(model, graph, cfg, train_node_type=tnt)
    return _dispatch(args, ds, est)


def run_edge_model(args, ds, graph, model, metric="mrr",
                   train_edge_type=-1):
    cfg = make_config(args, ds, metric)
    mesh = _make_mesh(args)
    if mesh is not None:
        est = SpmdEdgeEstimator(model, graph, cfg,
                                train_edge_type=train_edge_type, mesh=mesh)
    else:
        est = EdgeEstimator(model, graph, cfg,
                            train_edge_type=train_edge_type)
    return _dispatch(args, ds, est)


def run_graph_model(args, ds, graph, model, label_name="label",
                    num_classes=2):
    cfg = make_config(args, ds, "accuracy")
    mesh = _make_mesh(args)
    if mesh is not None:
        est = SpmdGraphEstimator(model, graph, cfg, label_name=label_name,
                                 num_classes=num_classes, mesh=mesh)
    else:
        est = GraphEstimator(model, graph, cfg, label_name=label_name,
                             num_classes=num_classes)
    return _dispatch(args, ds, est)


def kg_test_triples(ds, graph) -> np.ndarray:
    """(head, rel, tail) dataset triples -> [T,3] (src, dst, etype) model
    batches, mapping raw relation indices through the graph's type table."""
    return kg_test_triples_meta(ds, graph.meta)


def kg_test_triples_meta(ds, meta) -> np.ndarray:
    hrt = np.asarray(ds.test_triples, np.int64)
    rel_to_type = np.asarray([meta.edge_type_id(f"r{r}")
                              for r in range(meta.num_edge_types)])
    return np.stack([hrt[:, 0], hrt[:, 2], rel_to_type[hrt[:, 1]]],
                    axis=1).astype(np.int32)


def _is_edge_est(est):
    return isinstance(est, (EdgeEstimator, SpmdEdgeEstimator))


def _eval_ids(args, ds, est):
    """The evaluation input: test triples for edge models with a KG
    dataset (reference evaluates TransX from triple id files), node/graph
    ids otherwise."""
    if _is_edge_est(est) and hasattr(ds, "test_triples"):
        g = est.graph if hasattr(est, "graph") else est
        meta = g.meta if hasattr(g, "meta") else est.sg.meta
        return kg_test_triples_meta(ds, meta)
    return ds.test_ids


def _dispatch(args, ds, est):
    if args.run_mode == "train":
        out = est.train()
    elif args.run_mode == "evaluate":
        out = est.evaluate(_eval_ids(args, ds, est))
    elif args.run_mode == "infer":
        out_dir = args.infer_dir or args.model_dir
        emb = est.infer(ds.test_ids, out_dir=out_dir)
        out = {"embeddings": emb.shape}
    else:
        out = est.train()
        out.update(est.evaluate(_eval_ids(args, ds, est)))
    if args.run_mode in ("evaluate", "train_and_evaluate") and \
            _is_edge_est(est) and hasattr(ds, "test_triples"):
        # full-entity ranking: the protocol behind the reference's FB15k
        # MeanRank/Hit@10 table (examples/TransX/README.md)
        meta = est.graph.meta if hasattr(est, "graph") else est.sg.meta
        out.update(est.evaluate_ranking(kg_test_triples_meta(ds, meta)))
    print(f"[euler_tpu] {args.run_mode} done: "
          f"{ {k: v for k, v in out.items()} }")
    return out


def edge_type_ids(graph, names):
    return tuple(graph.meta.edge_type_id(n) for n in names)


def build_gnn(args, ds, graph, conv: str, flow_name: str = "sage",
              conv_kwargs=None, jk: bool = False):
    """conv-based supervised GNN on the dataset contract
    (the SupervisedGCN/SAGE/... pattern of every reference example)."""
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn

    ets = edge_type_ids(graph, ds.train_edge_type)
    layers = args.layers
    fanouts = args.fanouts or [10] * layers
    flow_cls = flows.get_flow_class(flow_name)
    if flow_name in ("full", "gcn", "sage", "sample"):
        flow = flow_cls(fanouts[:layers], [ets] * layers)
    elif flow_name == "whole":
        flow = flow_cls(layers, [ets] * layers)
    else:  # layerwise / fast / adapt
        flow = flow_cls([max(64, args.batch_size)] * layers, [ets] * layers)
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    dims = tuple([args.hidden_dim] * layers + [args.hidden_dim])
    net_cls = gnn.JKGNNNet if jk else gnn.GNNNet
    net = net_cls(conv=conv, flow=flow, dims=dims, feature=feat,
                  conv_kwargs=conv_kwargs or {})
    return gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                              label_dim=ds.label_dim)


def run_conv_example(conv: str, flow_name: str = "sage", conv_kwargs=None,
                     argv=None, **flag_defaults):
    args = parse_flags(argv, **flag_defaults)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    model = build_gnn(args, ds, graph, conv, flow_name, conv_kwargs)
    return run_node_model(args, ds, graph, model)


def run_graph_conv_example(conv: str, pool_name: str = "mean", argv=None,
                           **flag_defaults):
    """Graph-classification runner (GIN/set2set/gated_graph pattern,
    reference: examples/gin, examples/set2set)."""
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn, graph_model, pooling

    flag_defaults.setdefault("dataset", "mutag")
    args = parse_flags(argv, **flag_defaults)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    ets = (0,)
    fanouts = args.fanouts or [5] * args.layers
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = gnn.GNNNet(conv=conv,
                     flow=flows.SageDataFlow(fanouts[:args.layers],
                                             [ets] * args.layers),
                     dims=tuple([args.hidden_dim] * (args.layers + 1)),
                     feature=feat)
    # pooling segments = the PER-DEVICE graph count: under --mesh each
    # device pools its own batch slice
    pool_graphs = args.batch_size
    if getattr(args, "mesh", None) is not None:
        import jax
        pool_graphs = args.batch_size // jax.device_count()
    if pool_name == "set2set":
        pool = pooling.Set2SetPool(dim=args.hidden_dim,
                                   num_graphs=pool_graphs)
    elif pool_name == "attention":
        pool = pooling.AttentionPool(num_graphs=pool_graphs)
    else:
        pool = pooling.SegmentPool(aggr=pool_name,
                                   num_graphs=pool_graphs)
    model = graph_model.GraphModel(embedder=net, pool=pool,
                                   label_dim=ds.num_classes)
    return run_graph_model(args, ds, graph, model,
                           label_name=ds.label_idx,
                           num_classes=ds.num_classes)
