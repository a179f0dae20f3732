"""Unsupervised solution kit demo: PosNegLogits + xent_loss + samplers
over a two-tower GroupGNNNet (reference: examples/sample_solution with
mp_utils/group_gnn.py GroupGNNNet towers)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (edge_type_ids, get_dataset, parse_flags,  # noqa: E402
                    run_node_model)


def main(argv=None):
    args = parse_flags(argv)
    ds = get_dataset(args.dataset, args.data_dir)
    graph = ds.load_graph()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn, solution
    from euler_tpu.models.group_gnn import GroupGNNNet
    ets = edge_type_ids(graph, ds.train_edge_type)
    fanouts = args.fanouts or [10] * args.layers
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))
    mk = lambda: gnn.GNNNet(
        conv="sage", flow=flows.SageDataFlow(fanouts, [ets] * args.layers),
        dims=tuple([args.hidden_dim] * (args.layers + 1)), feature=feat)

    class SampleSolutionModel(nn.Module):
        # two independent towers (embedder / context) as one group net
        group: GroupGNNNet

        @nn.compact
        def __call__(self, g, roots):
            ks, kn = jax.random.split(self.make_rng("sample"))
            pos, pos_ok = solution.sample_pos_with_types(g, ks, roots, ets)
            negs = solution.sample_neg_with_types(g, kn, roots, -1, 5)
            B = roots.shape[0]
            ctx_ids = jnp.concatenate([pos[:, 0], negs.reshape(-1)])
            emb, ctx = self.group(g, [roots, ctx_ids])
            emb_pos = ctx[:B]
            emb_neg = ctx[B:].reshape(B, 5, -1)
            logits, neg_logits = solution.PosNegLogits()(emb, emb_pos,
                                                         emb_neg)
            loss = solution.xent_loss(logits, neg_logits, pos_ok[:, :1])
            return dict(embedding=emb, logits=logits,
                        neg_logits=neg_logits, loss=loss)

    return run_node_model(args, ds, graph,
                          SampleSolutionModel(group=GroupGNNNet(
                              gnns=(mk(), mk()))),
                          metric="mrr")


if __name__ == "__main__":
    main()
