import time, sys
t00 = time.perf_counter()
def mark(s): print(f"[{time.perf_counter()-t00:7.1f}s] {s}", flush=True)
import jax, jax.numpy as jnp, optax
mark("imports")
import dataclasses
from euler_tpu.dataflow import flows
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.graph.meta import FeatureSpec
from euler_tpu.models import encoders, gnn
from euler_tpu.ops import sampling
n_nodes, feat_dim, n_classes, batch, fanout = 200_000, 128, 16, 1024, [25, 10]
graph = random_graph(n_nodes, 25, seed=0, device_put=False, packs=("group", "fan"))
g = graph.tensors
mark("random_graph host build")
meta = dataclasses.replace(g.meta, node_features=(FeatureSpec("feature","dense",feat_dim), FeatureSpec("label","dense",n_classes)))
@jax.jit
def make_features():
    kf, kl = jax.random.split(jax.random.PRNGKey(42))
    feat = jax.random.normal(kf, (n_nodes, feat_dim), jnp.float32)
    lab = jax.nn.one_hot(jax.random.randint(kl, (n_nodes,), 0, n_classes), n_classes, dtype=jnp.float32)
    return feat, lab
feat_dev, lab_dev = make_features()
jax.block_until_ready(feat_dev)
mark("device features")
put = jax.device_put
g = g.replace(meta=meta, dense_nf={"feature": feat_dev, "label": lab_dev},
              fan_pack=put(g.fan_pack), group_ptr=put(g.group_ptr), adj_dst=put(g.adj_dst),
              adj_prob=put(g.adj_prob), adj_alias=put(g.adj_alias),
              node_alias=jax.tree.map(put, g.node_alias))
jax.block_until_ready(g.fan_pack)
mark("device_put graph hot set")
feat = encoders.ShallowEncoder(dense_names=("feature",))
net = gnn.GNNNet(conv="sage", flow=flows.SageDataFlow(fanout, [(0,), (0,)]), dims=(128, 128), feature=feat)
model = gnn.SuperviseModel(embedder=net, label_name="label", label_dim=n_classes)
tx = optax.adam(1e-3)
roots0 = jnp.arange(batch, dtype=jnp.int32)
rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
params = jax.jit(model.init)(rngs, g, roots0)
jax.block_until_ready(params)
mark("model.init")
opt_state = tx.init(params)
def step(g, params, opt_state, key):
    kb, ks = jax.random.split(key)
    roots = sampling.sample_node(g, kb, batch, -1)
    def loss_fn(p): return model.apply(p, g, roots, rngs={"sample": ks})["loss"]
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state2 = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state2, loss
@jax.jit
def run_loop(g, params, opt_state, key):
    def body(carry, i):
        params, opt_state = carry
        p2, o2, loss = step(g, params, opt_state, jax.random.fold_in(key, i))
        return (p2, o2), loss
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(50, dtype=jnp.int32))
    return params, opt_state, losses[-1]
c = run_loop.lower(g, params, opt_state, jax.random.PRNGKey(2)).compile()
mark("compile run_loop")
params, opt_state, loss = c(g, params, opt_state, jax.random.PRNGKey(2)); float(loss)
mark("warmup exec")
t0 = time.perf_counter()
gg = g
for i in range(4):
    gg = sampling.refresh_fan_pack(gg, jax.random.fold_in(jax.random.PRNGKey(9), i))
    params, opt_state, loss = c(gg, params, opt_state, jax.random.PRNGKey(3+i))
float(loss)
dt = time.perf_counter()-t0
mark(f"4 loops: {dt:.2f}s -> {(1024*25+1024*250+1024+1024*25)*50*4/dt/1e6:.1f}M edges/s")
