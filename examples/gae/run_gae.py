"""(Variational) graph autoencoder
(reference: examples/gae/gae.py, GaeEstimator)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (edge_type_ids, get_dataset, parse_flags,  # noqa: E402
                    run_node_model)


def main(argv=None):
    import argparse
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--variational", action="store_true")
    known, rest = pre.parse_known_args(argv)
    args = parse_flags(rest)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    from euler_tpu.dataflow import flows
    from euler_tpu.models import autoencoders, encoders, gnn
    ets = edge_type_ids(graph, ds.train_edge_type)
    fanouts = args.fanouts or [10] * args.layers
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = gnn.GNNNet(conv="gcn",
                     flow=flows.SageDataFlow(fanouts, [ets] * args.layers),
                     dims=tuple([args.hidden_dim] * (args.layers + 1)),
                     feature=feat)
    cls = autoencoders.VGAE if known.variational else autoencoders.GAE
    model = cls(embedder=net, edge_types=ets)
    return run_node_model(args, ds, graph, model, metric="mrr")


if __name__ == "__main__":
    main()
