import time, numpy as np, jax, jax.numpy as jnp
x = np.random.default_rng(0).integers(0, 100, (8*1024*1024,), dtype=np.int32)  # 32MB
for trial in range(3):
    t=time.perf_counter()
    d = jax.device_put(x)
    d.block_until_ready()
    dt = time.perf_counter()-t
    print(f"32MB put: {dt:.2f}s = {32/dt:.1f} MB/s")
    x = x + 1  # avoid caching
# dispatch latency
f = jax.jit(lambda a: a.sum())
r = f(d); float(r)
t=time.perf_counter()
for i in range(10): r = f(d)
float(r)
print("10 jit dispatches:", time.perf_counter()-t)
