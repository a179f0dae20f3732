"""Relational GCN over typed edges
(reference: examples/rgcn/run_rgcn.py — per-relation weight matrices)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import get_dataset, parse_flags, run_node_model  # noqa: E402


def main(argv=None):
    args = parse_flags(argv)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn
    ets = tuple(range(graph.meta.num_edge_types))   # all relations
    fanouts = args.fanouts or [10] * args.layers
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = gnn.GNNNet(
        conv="relation", flow=flows.SageDataFlow(fanouts,
                                                 [ets] * args.layers,
                                                 payload=True),
        dims=tuple([args.hidden_dim] * (args.layers + 1)), feature=feat,
        conv_kwargs={"num_relations": graph.meta.num_edge_types},
        relation_from_etype=True)
    model = gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                               label_dim=ds.label_dim)
    return run_node_model(args, ds, graph, model)


if __name__ == "__main__":
    main()
