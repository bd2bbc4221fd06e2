"""Round-3 attribution of the staged (device-resident) encode path.

Times the EXACT production path (api.compress_dispatch/finish) at GOP
granularity rather than forced per-stage fetches: (a) dispatch+finish of
one GOP alone, (b) dispatch of analyze only then one fetch, (c) the
3-GOP pipelined aggregate — the number bench.py reports.

Run from the repo root:  python tools/profile_round3.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from qsvc_tpu import api
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.io.yuv import Video
from qsvc_tpu.mctf import transform


def main():
    GOPS = 3
    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=GOPS,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)
    S = cfg.gop_size
    gop_cfg = cfg.replace(GOPs=1)
    chunks = [Video(vid.y[g * S:(g + 1) * S + 1],
                    vid.u[g * S:(g + 1) * S + 1],
                    vid.v[g * S:(g + 1) * S + 1]) for g in range(GOPS)]
    staged = [Video(jnp.asarray(c.y), jnp.asarray(c.u), jnp.asarray(c.v))
              for c in chunks]
    for c in staged:
        jax.device_get(c.y.ravel()[:1])

    t0 = time.time()
    _ = api.compress_finish(api.compress_dispatch(staged[0], gop_cfg,
                                                  reversible=False))
    print(f"warmup (1 GOP, cached compiles): {time.time()-t0:.1f}s",
          flush=True)

    # (a) single-GOP latency, no pipelining
    for rep in range(3):
        t0 = time.time()
        _ = api.compress_finish(api.compress_dispatch(staged[0], gop_cfg,
                                                      reversible=False))
        print(f"one-GOP dispatch+finish: {time.time()-t0:.3f}s", flush=True)

    # (b) analyze only, one scalar fetch
    for rep in range(3):
        t0 = time.time()
        st = transform.analyze_jit(jnp.asarray(staged[0].y),
                                   jnp.asarray(staged[0].u),
                                   jnp.asarray(staged[0].v), gop_cfg)
        jax.device_get(st.low_y.ravel()[:1])
        print(f"analyze+fetch1: {time.time()-t0:.3f}s", flush=True)

    # (b2) dispatch-only cost (host trace time, nothing fetched)
    t0 = time.time()
    pend = api.compress_dispatch(staged[1], gop_cfg, reversible=False)
    print(f"dispatch host time: {time.time()-t0:.3f}s", flush=True)
    t0 = time.time()
    _ = api.compress_finish(pend)
    print(f"finish after dispatch: {time.time()-t0:.3f}s", flush=True)

    # (c) pipelined aggregate (bench headline)
    for rep in range(2):
        t0 = time.time()
        pends = [api.compress_dispatch(c, gop_cfg, reversible=False)
                 for c in staged]
        _ = [api.compress_finish(p) for p in pends]
        dt = time.time() - t0
        print(f"3-GOP pipelined: {dt:.3f}s = {vid.frames/dt:.2f} fps",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
