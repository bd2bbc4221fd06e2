"""Stage-level timing of the 1080p bench config (not part of the package)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from qsvc_tpu.api import compress
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.mctf import transform, motion_coding
from qsvc_tpu.codec import frame_codec, fast


def t(label, fn, *a, **kw):
    t0 = time.time()
    r = fn(*a, **kw)
    jax.block_until_ready(r) if hasattr(r, "block_until_ready") or isinstance(r, (list, tuple)) else None
    print(f"{label:36s} {time.time()-t0:7.3f}s")
    return r


cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                  SRLs=5, search_range=4, update_factor=0.25,
                  quantization_texture=45000)
vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x, seed=0)

# full warm
vs = compress(vid, cfg, reversible=False)
print("warm done")

for rep in range(2):
    print(f"--- rep {rep}")
    t0 = time.time()
    y32 = np.asarray(vid.y, np.int32); u32 = np.asarray(vid.u, np.int32); v32 = np.asarray(vid.v, np.int32)
    print(f"{'host int32 cast':36s} {time.time()-t0:7.3f}s")
    t0 = time.time()
    y = jnp.asarray(y32); u = jnp.asarray(u32); v = jnp.asarray(v32)
    jax.block_until_ready((y, u, v))
    print(f"{'upload int32':36s} {time.time()-t0:7.3f}s")
    t0 = time.time()
    y8 = jnp.asarray(vid.y); u8 = jnp.asarray(vid.u); v8 = jnp.asarray(vid.v)
    jax.block_until_ready((y8, u8, v8))
    print(f"{'upload uint8':36s} {time.time()-t0:7.3f}s")

    t0 = time.time()
    stream = transform.analyze_jit(y, u, v, cfg)
    jax.block_until_ready(stream.low_y)
    print(f"{'MCTF analyze (device)':36s} {time.time()-t0:7.3f}s")

    stacks = [stream.low_y, stream.low_u, stream.low_v]
    for lev in stream.levels:
        stacks += [lev.high_y, lev.high_u, lev.high_v]

    t0 = time.time()
    pendings = [frame_codec.encode_frames_dispatch(p, cfg.SRLs - 1, False, 0.5)
                for p in stacks]
    for p in pendings:
        jax.block_until_ready(p[1])
    print(f"{'DWT+quant all stacks (device)':36s} {time.time()-t0:7.3f}s")

    t0 = time.time()
    packeds = [frame_codec.encode_frames_fetch(p) for p in pendings]
    print(f"{'fetch int16 (transfer)':36s} {time.time()-t0:7.3f}s")
    nb = sum(p.nbytes for p in packeds)
    print(f"  fetched {nb/1e6:.1f} MB")

    t0 = time.time()
    enc = [frame_codec.encode_frames_host(pk, cfg.SRLs - 1, False, 0.5, 64,
                                          frame_codec.slope_to_threshold(45000.0),
                                          "bp")
           for pk in packeds]
    print(f"{'native EBCOT (host)':36s} {time.time()-t0:7.3f}s")

    t0 = time.time()
    mv_fields = [lev.mv for lev in stream.levels]
    residues = jax.device_get(motion_coding.decorrelate_jit(mv_fields))
    print(f"{'motion coding':36s} {time.time()-t0:7.3f}s")
