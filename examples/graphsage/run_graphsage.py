"""Supervised/unsupervised GraphSAGE
(reference: examples/graphsage/graphsage.py:56-115, run_graphsage.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (build_gnn, edge_type_ids, get_dataset,  # noqa: E402
                    parse_flags, run_node_model)


def main(argv=None):
    import argparse
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--unsupervised", action="store_true")
    known, rest = pre.parse_known_args(argv)
    args = parse_flags(rest)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    if known.unsupervised:
        from euler_tpu.dataflow import flows
        from euler_tpu.models import encoders, gnn
        ets = edge_type_ids(graph, ds.train_edge_type)
        feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
        fanouts = args.fanouts or [10] * args.layers
        mk = lambda: gnn.GNNNet(
            conv="sage", flow=flows.SageDataFlow(fanouts, [ets] * args.layers),
            dims=tuple([args.hidden_dim] * (args.layers + 1)), feature=feat)
        model = gnn.UnsuperviseModel(embedder=mk(), context_embedder=mk(),
                                     edge_types=ets)
        return run_node_model(args, ds, graph, model, metric="mrr")
    model = build_gnn(args, ds, graph, "sage", "sage")
    return run_node_model(args, ds, graph, model)


if __name__ == "__main__":
    main()
