"""LINE first/second-order embeddings (reference: examples/line)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (edge_type_ids, get_dataset, parse_flags,  # noqa: E402
                    run_node_model)


def main(argv=None):
    import argparse
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--order", type=int, default=2, choices=[1, 2])
    pre.add_argument("--embedding_dim", type=int, default=64)
    pre.add_argument("--num_negs", type=int, default=8)
    known, rest = pre.parse_known_args(argv)
    args = parse_flags(rest)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    from euler_tpu.models import walk_models
    ets = edge_type_ids(graph, ds.train_edge_type)
    model = walk_models.LINE(n_nodes=graph.meta.n_nodes,
                             dim=known.embedding_dim, edge_types=ets,
                             order=known.order, num_negs=known.num_negs)
    return run_node_model(args, ds, graph, model, metric="mrr",
                          train_node_type=-1)


if __name__ == "__main__":
    main()
