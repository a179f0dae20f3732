"""Where do GAT's extra 3.2ms/step go? (53.7M vs sage 124M edges/s)

Times full train loops on the bench graph (200k nodes) for: sage, gat,
gat with attention replaced by the mask (isolates the SDDMM/softmax
machinery), and forward-only variants (splits fwd vs bwd cost).
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from euler_tpu.dataflow import flows
from euler_tpu.dataflow.block import Block
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.graph.meta import FeatureSpec
from euler_tpu.models import convs, encoders, gnn
from euler_tpu.ops import sampling

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/euler_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

N, BATCH, FANOUT, STEPS = 200_000, 1024, [25, 10], 50


class GatNoAttn(nn.Module):
    """GAT minus the attention: same fc/projections, scale = mask."""
    dim: int

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        fc = nn.Dense(self.dim, use_bias=False)
        h_src = fc(x_src)
        return block.aggregate_neighbors("add", h_src, mask=block.mask)


class GatNoSoftmax(nn.Module):
    """GAT with raw (unnormalized) attention: skips block.softmax."""
    dim: int

    @nn.compact
    def __call__(self, x, block: Block):
        x_tgt, x_src = x
        mask = block.mask
        fc = nn.Dense(self.dim, use_bias=False)
        h_src = fc(x_src)
        h_tgt = h_src[: block.size[0]]
        alpha = (block.gather_tgt(nn.Dense(1, use_bias=False)(h_tgt)) +
                 block.gather_src(nn.Dense(1, use_bias=False)(h_src)))
        alpha = nn.leaky_relu(alpha, negative_slope=0.2)
        return block.aggregate_neighbors(
            "add", h_src, scale=alpha * mask[:, None])


convs._CONVS["gat_noattn"] = GatNoAttn
convs._CONVS["gat_nosm"] = GatNoSoftmax


def main():
    graph = random_graph(N, 25, seed=0, device_put=False,
                         packs=("group", "fan"))
    g = graph.tensors
    meta = dataclasses.replace(
        g.meta, node_features=(FeatureSpec("feature", "dense", 128),
                               FeatureSpec("label", "dense", 16)))
    act = jnp.bfloat16

    @jax.jit
    def mk():
        kf, kl = jax.random.split(jax.random.PRNGKey(42))
        return (jax.random.normal(kf, (N, 128), act),
                jax.nn.one_hot(jax.random.randint(kl, (N,), 0, 16), 16,
                               dtype=jnp.float32))

    fd, ld = mk()
    put = jax.device_put
    g = g.replace(meta=meta, dense_nf={"feature": fd, "label": ld},
                  fan_pack=put(g.fan_pack), group_ptr=put(g.group_ptr),
                  adj_dst=put(g.adj_dst), adj_prob=put(g.adj_prob),
                  adj_alias=put(g.adj_alias),
                  fan_over_rows=put(g.fan_over_rows),
                  node_alias=jax.tree.map(put, g.node_alias))

    def run(conv, fwd_only=False):
        feat = encoders.ShallowEncoder(dense_names=("feature",))
        net = gnn.GNNNet(conv=conv,
                         flow=flows.SageDataFlow(FANOUT, [(0,), (0,)]),
                         dims=(128, 128), feature=feat, dtype=act)
        model = gnn.SuperviseModel(embedder=net, label_name="label",
                                   label_dim=16)
        tx = optax.adam(1e-3)
        rngs = {"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1)}
        params = jax.jit(model.init)(rngs, g,
                                     jnp.arange(BATCH, dtype=jnp.int32))
        opt = tx.init(params)

        def step(g, p, o, key):
            kb, ks = jax.random.split(key)
            roots = sampling.sample_node(g, kb, BATCH, -1)

            def lf(p):
                return model.apply(p, g, roots,
                                   rngs={"sample": ks})["loss"]
            if fwd_only:
                return p, o, lf(p)
            loss, grads = jax.value_and_grad(lf)(p)
            up, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, up), o2, loss

        @jax.jit
        def loop(g, p, o, key):
            def body(c, i):
                p, o = c
                p2, o2, l = step(g, p, o, jax.random.fold_in(key, i))
                return (p2, o2), l
            (p, o), ls = jax.lax.scan(body, (p, o),
                                      jnp.arange(STEPS, dtype=jnp.int32))
            return ls[-1]

        # bench.py's pipelined protocol: AOT compile, enqueue 4 loop
        # dispatches, sync once — otherwise per-dispatch tunnel overhead
        # (~2s of arg processing) swamps the 0.1s of device work
        compiled = loop.lower(g, params, opt,
                              jax.random.PRNGKey(2)).compile()
        float(compiled(g, params, opt, jax.random.PRNGKey(2)))
        t0 = time.perf_counter()
        last = None
        for i in range(4):
            last = compiled(g, params, opt, jax.random.PRNGKey(3 + i))
        float(last)
        ms = (time.perf_counter() - t0) / (4 * STEPS) * 1e3
        tag = conv + (" fwd" if fwd_only else " fwd+bwd")
        print(f"{tag:24s} {ms:7.3f} ms/step")
        return ms

    for c in ("sage", "gat_noattn", "gat_nosm", "gat"):
        run(c, fwd_only=True)
    for c in ("sage", "gat_noattn", "gat_nosm", "gat"):
        run(c)


if __name__ == "__main__":
    main()
