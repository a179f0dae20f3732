"""Solution kit demo: composable supervised head
(reference: examples/solution — base_supervise + DenseLogits)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (edge_type_ids, get_dataset, parse_flags,  # noqa: E402
                    run_node_model)


def main(argv=None):
    args = parse_flags(argv)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    import jax.numpy as jnp
    from flax import linen as nn

    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn, solution
    from euler_tpu.ops import feature_ops
    ets = edge_type_ids(graph, ds.train_edge_type)
    fanouts = args.fanouts or [10] * args.layers
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    net = gnn.GNNNet(conv="sage",
                     flow=flows.SageDataFlow(fanouts, [ets] * args.layers),
                     dims=tuple([args.hidden_dim] * (args.layers + 1)),
                     feature=feat)
    label_name, label_dim = ds.label_idx, ds.label_dim

    class SolutionModel(nn.Module):
        """supervised solution = embedder + DenseLogits + sigmoid_loss."""
        embedder: nn.Module

        @nn.compact
        def __call__(self, g, roots):
            emb = self.embedder(g, roots)
            logit = solution.DenseLogits(label_dim)(emb)
            (label,) = feature_ops.get_dense_feature(g, roots, [label_name])
            label = label[:, :label_dim]
            mask = (roots >= 0)[:, None]
            loss = solution.sigmoid_loss(logit, label, mask)
            return dict(embedding=emb, logit=logit, label=label, loss=loss)

    return run_node_model(args, ds, graph, SolutionModel(embedder=net))


if __name__ == "__main__":
    main()
