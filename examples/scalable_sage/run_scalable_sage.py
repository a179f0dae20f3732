"""Scalable GraphSAGE with historical-embedding caches — the
papers100M-shaped configuration of SURVEY §7 tier 7.

reference: ScalableSageEncoder (tf_euler/python/utils/encoders.py:
629-749) — per-layer embedding stores detach the recursive expansion,
so a depth-L model touches O(fanout) nodes per root instead of
O(fanout^L). Here the stores are device-resident flax ``cache``
variables (models/scalable.py) and the fan-pack reservoir keeps
high-degree neighborhoods fresh via RunConfig.reservoir_refresh.

Runnable on the synthetic stand-in (default): a 20k-node power-law-ish
SBM stressing deg > FAN_D reservoir rows; drop ogbn-scale data in via
the streaming converter (euler_tpu.graph.stream_convert) and --dataset.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import edge_type_ids, get_dataset, parse_flags  # noqa: E402
from common import run_node_model  # noqa: E402


def main(argv=None):
    args = parse_flags(argv, num_epochs=5)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    from euler_tpu.models import encoders, gnn, scalable
    ets = edge_type_ids(graph, ds.train_edge_type)
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = scalable.ScalableGNNNet(
        edge_types=ets,
        num_layers=args.layers,
        dim=args.hidden_dim,
        feature=feat,
        n_nodes=graph.meta.n_nodes,
        fanout=(args.fanouts or [10])[0],
    )
    model = gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                               label_dim=ds.label_dim)
    return run_node_model(args, ds, graph, model)


if __name__ == "__main__":
    main()
