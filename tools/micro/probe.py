import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
x = jnp.ones((2048, 2048), jnp.float32)
float(f(x))
for _ in range(3):
    t = time.perf_counter()
    r = f(x); float(r)
    print(f"2k matmul roundtrip: {time.perf_counter()-t:.3f}s")
