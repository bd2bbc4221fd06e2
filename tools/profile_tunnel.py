"""Measure the axon tunnel's raw RPC latency and host<->device bandwidth."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # RPC latency: tiny round trips
    x = jnp.zeros((8,), jnp.int32)
    jax.device_get(x)
    t0 = time.time()
    n = 20
    for _ in range(n):
        jax.device_get(x)
    lat = (time.time() - t0) / n
    print(f"round-trip latency: {lat*1e3:.1f} ms")

    # upload bandwidth
    for mb in (16, 64):
        a = np.random.randint(0, 255, (mb << 20,), np.uint8)
        d = jax.device_put(a)
        jax.device_get(d[:8])
        t0 = time.time()
        d = jax.device_put(a)
        jax.device_get(d[:8])
        dt = time.time() - t0
        print(f"upload {mb} MB: {dt:.2f}s = {mb/dt:.1f} MB/s")

    # download bandwidth
    for mb in (16, 64):
        d = jnp.zeros((mb << 20,), jnp.uint8)
        jax.device_get(d[:8])
        t0 = time.time()
        h = jax.device_get(d)
        dt = time.time() - t0
        print(f"download {mb} MB: {dt:.2f}s = {mb/dt:.1f} MB/s")

    # device compute throughput sanity: big matmul
    m = 8192
    a = jnp.ones((m, m), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    r = f(a); jax.device_get(r[:1, :1])
    t0 = time.time()
    r = f(a); jax.device_get(r[:1, :1])
    dt = time.time() - t0
    print(f"matmul {m}^3 bf16: {dt*1e3:.1f} ms = {2*m**3/dt/1e12:.1f} TFLOPS")

    # HBM bandwidth sanity: big elementwise
    n = 1 << 28  # 256M f32 = 1 GB
    a = jnp.ones((n,), jnp.float32)
    f = jax.jit(lambda a: a * 2.0 + 1.0)
    r = f(a); jax.device_get(r[:1])
    t0 = time.time()
    r = f(a); jax.device_get(r[:1])
    dt = time.time() - t0
    print(f"elementwise 1GiB read+write: {dt*1e3:.1f} ms = "
          f"{2*n*4/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
