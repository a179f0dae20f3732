import time, json
t00=time.perf_counter()
import jax, jax.numpy as jnp, optax, numpy as np
from euler_tpu.dataflow import flows
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.models import encoders, gnn
from euler_tpu.ops import mp_ops, sampling
print("imports", time.perf_counter()-t00)

t=time.perf_counter()
graph = random_graph(200_000, 25, feat_dim=128, n_classes=16, seed=0)
g = graph.tensors
jax.block_until_ready(g.adj_dst)
print("random_graph+store+device_put", time.perf_counter()-t)

feat = encoders.ShallowEncoder(dense_names=("feature",))
net = gnn.GNNNet(conv="sage", flow=flows.SageDataFlow([25,10], [(0,),(0,)]), dims=(128,128), feature=feat)
model = gnn.SuperviseModel(embedder=net, label_name="label", label_dim=16)
tx = optax.adam(1e-3)
roots0 = jnp.arange(1024, dtype=jnp.int32)
rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
t=time.perf_counter()
params = jax.jit(model.init)(rngs, g, roots0)
jax.block_until_ready(params)
print("model.init jit", time.perf_counter()-t)
opt_state = tx.init(params)

def step(g, params, opt_state, key):
    kb, ks = jax.random.split(key)
    roots = sampling.sample_node(g, kb, 1024, -1)
    def loss_fn(p):
        return model.apply(p, g, roots, rngs={"sample": ks})["loss"]
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

t=time.perf_counter()
lowered = run_loop.lower(g, params, opt_state, jax.random.PRNGKey(2))
print("trace/lower", time.perf_counter()-t)
t=time.perf_counter()
compiled = lowered.compile()
print("compile", time.perf_counter()-t)
t=time.perf_counter()
params, opt_state, loss = compiled(g, params, opt_state, jax.random.PRNGKey(2))
float(loss)
print("first run_loop exec", time.perf_counter()-t)
t=time.perf_counter()
for i in range(4):
    params, opt_state, loss = compiled(g, params, opt_state, jax.random.PRNGKey(3+i))
float(loss)
dt=time.perf_counter()-t
print("4 outer loops", dt)
eps = (1024*25 + 1024*25*10 + 1024 + 1024*25)*50*4/dt
print("edges/s", eps)
print("TOTAL", time.perf_counter()-t00)
