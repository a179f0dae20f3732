"""Bisect the GNN forward: which stage costs what on the real chip."""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.dataflow import flows
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.models import encoders, gnn
from euler_tpu.ops import feature_ops

ITERS = 50


def bench(name, fn, *args):
    @jax.jit
    def loop(key, args):
        def body(acc, i):
            out = fn(jax.random.fold_in(key, i), *args)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l).astype(jnp.float32) for l in leaves), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    float(loop(jax.random.PRNGKey(0), args))
    t0 = time.perf_counter()
    float(loop(jax.random.PRNGKey(1), args))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:40s} {ms:8.3f} ms")
    return ms


def main():
    n_nodes, avg_deg, feat_dim, batch = 200_000, 25, 128, 1024
    fanout = [25, 10]
    graph = random_graph(n_nodes, avg_deg, feat_dim=feat_dim, n_classes=16,
                         seed=0)
    g = graph.tensors
    roots = jnp.arange(batch, dtype=jnp.int32)
    flow = flows.SageDataFlow(fanout, [(0,), (0,)])

    def mkflow(k, g, r):
        return flow(g, k, r)

    blocks = jax.jit(lambda k, g, r: flow(g, k, r))(
        jax.random.PRNGKey(9), g, roots)

    bench("flow", lambda k, g, r: [b.n_id for b in flow(g, k, r)], g, roots)

    def flow_feat(k, g, r):
        blks = flow(g, k, r)
        x = g.dense_nf["feature"][jnp.maximum(blks[0].n_id, 0)]
        return x

    bench("flow+rawgather", flow_feat, g, roots)

    feat = encoders.ShallowEncoder(dense_names=("feature",))
    fparams = jax.jit(lambda g, n: feat.init({}, g, n))(g, blocks[0].n_id)

    def flow_enc(k, g, r):
        blks = flow(g, k, r)
        return feat.apply(fparams, g, blks[0].n_id)

    bench("flow+encoder", flow_enc, g, roots)

    # conv stack without head
    net = gnn.GNNNet(conv="sage", flow=flow, dims=(128, 128), feature=feat)
    nparams = jax.jit(net.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        g, roots)
    bench("flow+enc+convs(GNNNet)",
          lambda k, g, r: net.apply(nparams, g, r, rngs={"sample": k}),
          g, roots)

    model = gnn.SuperviseModel(embedder=net, label_name="label",
                               label_dim=16)
    mparams = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        g, roots)
    bench("full model fwd",
          lambda k, g, r: model.apply(mparams, g, r,
                                      rngs={"sample": k})["loss"], g, roots)

    # conv stack alone on fixed blocks (no flow)
    def convs_only(k, g, blocks):
        x = feat.apply(fparams, g, blocks[0].n_id)
        from euler_tpu.models import convs as convs_lib
        return x.sum() * 0 + jax.random.uniform(k, ())

    # per-layer: manual conv application over fixed blocks
    from euler_tpu.models.convs import SAGEConv
    conv0 = SAGEConv(dim=128)
    x0 = jax.jit(lambda g, n: feat.apply(fparams, g, n))(g, blocks[0].n_id)
    c0p = conv0.init(jax.random.PRNGKey(0), (x0[:blocks[0].size[0]], x0),
                     blocks[0])

    def conv0_only(k, x0, blk):
        xt = x0[: blk.size[0]] + jax.random.uniform(k, ()) * 0
        return conv0.apply(c0p, (xt, x0), blk)

    bench("conv0 alone (26624 tgt, 293k src)", conv0_only, x0, blocks[0])

    x1 = conv0.apply(c0p, (x0[:blocks[0].size[0]], x0), blocks[0])
    conv1 = SAGEConv(dim=128)
    c1p = conv1.init(jax.random.PRNGKey(0), (x1[:blocks[1].size[0]], x1),
                     blocks[1])

    def conv1_only(k, x1, blk):
        xt = x1[: blk.size[0]] + jax.random.uniform(k, ()) * 0
        return conv1.apply(c1p, (xt, x1), blk)

    bench("conv1 alone (1024 tgt, 26k src)", conv1_only, x1, blocks[1])


if __name__ == "__main__":
    main()
