import time
t00 = time.perf_counter()
def mark(s): print(f"[{time.perf_counter()-t00:7.1f}s] {s}", flush=True)
import jax, jax.numpy as jnp, optax, dataclasses
from euler_tpu.dataflow import flows
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.graph.meta import FeatureSpec
from euler_tpu.models import encoders, gnn
from euler_tpu.ops import sampling
n_nodes, feat_dim, n_classes, batch, fanout = 200_000, 128, 16, 1024, [25, 10]
graph = random_graph(n_nodes, 25, seed=0, device_put=False, packs=("group", "fan"))
g = graph.tensors
meta = dataclasses.replace(g.meta, node_features=(FeatureSpec("feature","dense",feat_dim), FeatureSpec("label","dense",n_classes)))
@jax.jit
def make_features():
    kf, kl = jax.random.split(jax.random.PRNGKey(42))
    return jax.random.normal(kf, (n_nodes, feat_dim), jnp.float32), jax.nn.one_hot(jax.random.randint(kl, (n_nodes,), 0, n_classes), n_classes, dtype=jnp.float32)
feat_dev, lab_dev = make_features()
put = jax.device_put
g = g.replace(meta=meta, dense_nf={"feature": feat_dev, "label": lab_dev},
              fan_pack=put(g.fan_pack), group_ptr=put(g.group_ptr), adj_dst=put(g.adj_dst),
              adj_prob=put(g.adj_prob), adj_alias=put(g.adj_alias),
              node_alias=jax.tree.map(put, g.node_alias))
feat = encoders.ShallowEncoder(dense_names=("feature",))
net = gnn.GNNNet(conv="sage", flow=flows.SageDataFlow(fanout, [(0,), (0,)]), dims=(128, 128), feature=feat)
model = gnn.SuperviseModel(embedder=net, label_name="label", label_dim=n_classes)
tx = optax.adam(1e-3)
rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
params = jax.jit(model.init)(rngs, g, jnp.arange(batch, dtype=jnp.int32))
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
params, opt_state, loss = run_loop(g, params, opt_state, jax.random.PRNGKey(2)); float(loss)
mark("warmup done")
t0 = time.perf_counter()
for i in range(4):
    params, opt_state, loss = run_loop(g, params, opt_state, jax.random.PRNGKey(3+i))
float(loss)
dt = time.perf_counter()-t0
mark(f"4 loops NO refresh: {dt:.2f}s -> {(1024*25+1024*250+1024+1024*25)*50*4/dt/1e6:.1f}M edges/s")
gg = sampling.refresh_fan_pack(g, jax.random.PRNGKey(9)); jax.block_until_ready(gg.fan_pack)
mark("refresh compile+first")
t0 = time.perf_counter()
for i in range(4):
    gg = sampling.refresh_fan_pack(gg, jax.random.fold_in(jax.random.PRNGKey(10), i))
jax.block_until_ready(gg.fan_pack)
mark(f"4 refreshes: {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
for i in range(4):
    gg = sampling.refresh_fan_pack(gg, jax.random.fold_in(jax.random.PRNGKey(11), i))
    params, opt_state, loss = run_loop(gg, params, opt_state, jax.random.PRNGKey(20+i))
float(loss)
dt = time.perf_counter()-t0
mark(f"4 loops WITH refresh: {dt:.2f}s -> {(1024*25+1024*250+1024+1024*25)*50*4/dt/1e6:.1f}M edges/s")
