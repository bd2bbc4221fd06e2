import sys, time
from concurrent.futures import ThreadPoolExecutor
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

a = np.random.randint(0, 255, (48 << 20,), np.uint8)  # 48 MB
d = jax.device_put(a); jax.device_get(d[:1])

# serial
t0 = time.time()
d = jax.device_put(a); jax.device_get(d[:1])
print(f"serial 48MB: {time.time()-t0:.2f}s", flush=True)

# 4 chunks serial-dispatch (async?) then force
chunks = np.split(a, 4)
t0 = time.time()
ds = [jax.device_put(c) for c in chunks]
for dd in ds: jax.device_get(dd[:1])
print(f"4-chunk dispatch-then-force: {time.time()-t0:.2f}s", flush=True)

# 4 threads
def up(c):
    dd = jax.device_put(c); jax.device_get(dd[:1]); return dd
t0 = time.time()
with ThreadPoolExecutor(4) as ex:
    list(ex.map(up, chunks))
print(f"4-thread: {time.time()-t0:.2f}s", flush=True)

# does upload overlap with device compute?
big = jnp.ones((1<<28,), jnp.float32)
f = jax.jit(lambda x: ((x * 1.000001) ** 0.5 + x) @ jnp.ones((1,), jnp.float32) if False else jnp.sum(jnp.sqrt(x*1.1)+jnp.sqrt(x*1.2)+jnp.sqrt(x*1.3)+jnp.sqrt(x*1.4)))
r = f(big); jax.device_get(r)
t0 = time.time(); r = f(big); jax.device_get(r); tc = time.time()-t0
print(f"compute alone: {tc:.2f}s", flush=True)
t0 = time.time()
r = f(big)
d2 = jax.device_put(a)
jax.device_get(r); jax.device_get(d2[:1])
print(f"compute + 48MB upload interleaved: {time.time()-t0:.2f}s", flush=True)
