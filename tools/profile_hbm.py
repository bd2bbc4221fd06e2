import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

def bench(label, f, *args, traffic=None):
    r = f(*args); jax.device_get(np.asarray(r).ravel()[:1] if not hasattr(r, 'ravel') else None) if False else jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.time()
    r = f(*args); jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    dt = time.time() - t0
    msg = f"{label:44s} {dt*1e3:8.1f} ms"
    if traffic: msg += f"  {traffic/dt/1e9:7.0f} GB/s"
    print(msg, flush=True)

n = 1 << 28
a32 = jnp.ones((n,), jnp.float32)
bench("1D f32 a*2+1 (1GiB)", jax.jit(lambda a: a*2.0+1.0), a32, traffic=2*n*4)
a16 = jnp.ones((n,), jnp.bfloat16)
bench("1D bf16 a*2+1 (0.5GiB)", jax.jit(lambda a: a*2.0+1.0), a16, traffic=2*n*2)
i16 = jnp.ones((n,), jnp.int16)
bench("1D i16 a*2+1", jax.jit(lambda a: a*2+1), i16, traffic=2*n*2)
b = jnp.ones((8192, 8192), jnp.float32)
bench("2D f32 a*2+1 (256MB)", jax.jit(lambda a: a*2.0+1.0), b, traffic=2*b.nbytes)
bench("2D f32 sum-rows", jax.jit(lambda a: a.sum(axis=1)), b, traffic=b.nbytes)
bench("2D f32 sum-all", jax.jit(lambda a: a.sum()), b, traffic=b.nbytes)
c = jnp.ones((17, 1088, 1920), jnp.int32)
bench("17x1080p i32 chain of 10 adds", jax.jit(lambda a: a+1+2+3+4+5+6+7+8+9+10), c, traffic=2*c.nbytes)
d = jnp.ones((13000, 64, 64), jnp.uint16)
def simlike(m):
    acc = jnp.zeros(m.shape[0], jnp.float32)
    for p in range(4):
        bits = ((m >> p) & 1).astype(bool)
        acc += jnp.sum(bits, axis=(1,2)).astype(jnp.float32)
    return acc
bench("sim-like 4 planes over 13k tiles u16", jax.jit(simlike), d, traffic=4*d.nbytes)
