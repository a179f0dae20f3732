"""LGCN ranked top-k channel pooling (reference: examples/lgcn)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (edge_type_ids, get_dataset, parse_flags,  # noqa: E402
                    run_node_model)


def main(argv=None):
    args = parse_flags(argv)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, extra_nets, gnn
    ets = edge_type_ids(graph, ds.train_edge_type)
    fanouts = args.fanouts or [6] * args.layers
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = extra_nets.LGCNNet(
        flow=flows.SageDataFlow(fanouts, [ets] * args.layers),
        dims=tuple([args.hidden_dim] * (args.layers + 1)), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                               label_dim=ds.label_dim)
    return run_node_model(args, ds, graph, model)


if __name__ == "__main__":
    main()
