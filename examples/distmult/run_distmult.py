"""DistMult bilinear KG scoring (reference: examples/distmult)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import get_dataset, parse_flags, run_edge_model  # noqa: E402


def main(argv=None):
    import argparse
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--embedding_dim", type=int, default=64)
    pre.add_argument("--num_negs", type=int, default=8)
    known, rest = pre.parse_known_args(argv)
    args = parse_flags(rest, dataset="fb15k")
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    from euler_tpu.models import kg
    model = kg.DistMult(n_entities=graph.meta.n_nodes,
                        n_relations=graph.meta.num_edge_types,
                        ent_dim=known.embedding_dim,
                        rel_dim=known.embedding_dim,
                        num_negs=known.num_negs)
    return run_edge_model(args, ds, graph, model, metric="mrr")


if __name__ == "__main__":
    main()
