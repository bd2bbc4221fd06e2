import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

f = jax.jit(lambda a: a + 1)
x = jnp.ones((256, 256), jnp.float32)
x = f(x); jax.device_get(x.ravel()[:1])

for n in (1, 10, 100):
    y = x
    t0 = time.time()
    for _ in range(n):
        y = f(y)
    jax.device_get(y.ravel()[:1])
    dt = time.time() - t0
    print(f"chain of {n:4d} tiny jit calls: {dt*1e3:8.1f} ms  "
          f"({dt/n*1e3:.2f} ms/call)", flush=True)

# bigger op in chain: 17x1080p i32
g = jax.jit(lambda a: a * 2 + 1)
z = jnp.ones((17, 1088, 1920), jnp.int32)
z = g(z); jax.device_get(z.ravel()[:1])
for n in (1, 10, 30):
    y = z
    t0 = time.time()
    for _ in range(n):
        y = g(y)
    jax.device_get(y.ravel()[:1])
    dt = time.time() - t0
    print(f"chain of {n:4d} 134MB-elementwise calls: {dt*1e3:8.1f} ms "
          f"({dt/n*1e3:.2f} ms/call)", flush=True)
