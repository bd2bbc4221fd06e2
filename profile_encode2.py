"""Stage timing of the real api.compress sparse path at the bench config."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from qsvc_tpu.api import compress
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.mctf import transform, motion_coding
from qsvc_tpu.codec import frame_codec
from qsvc_tpu.codec.frame_codec import slope_to_threshold

cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                  SRLs=5, search_range=4, update_factor=0.25,
                  quantization_texture=45000)
vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x, seed=0)

vs = compress(vid, cfg, reversible=False)
print("warm done; bytes:", len(vs.to_bytes()))

import math
t = slope_to_threshold(45000.0)
delta = float(np.clip(math.sqrt(t) / 8.0, 0.125, 8.0))
slopes = cfg.slopes()

for rep in range(2):
    print(f"--- rep {rep}")
    T0 = time.time()
    t0 = time.time()
    y = jnp.asarray(np.asarray(vid.y, np.uint8))
    u = jnp.asarray(np.asarray(vid.u, np.uint8))
    v = jnp.asarray(np.asarray(vid.v, np.uint8))
    jax.block_until_ready((y, u, v))
    print(f"{'upload uint8':34s} {time.time()-t0:7.3f}s")
    t0 = time.time()
    stream = transform.analyze_jit(y, u, v, cfg)
    jax.block_until_ready(stream.low_y)
    print(f"{'MCTF analyze (device)':34s} {time.time()-t0:7.3f}s")
    stacks = [(stream.low_y, slope_to_threshold(slopes[0][0]))]
    stacks += [(stream.low_u, stacks[0][1]), (stream.low_v, stacks[0][1])]
    for tt, lev in enumerate(stream.levels, start=1):
        mt = slope_to_threshold(slopes[cfg.TRLs - tt][0])
        stacks += [(lev.high_y, mt), (lev.high_u, mt), (lev.high_v, mt)]
    t0 = time.time()
    pendings = [frame_codec.encode_frames_dispatch_sparse(
        p, cfg.SRLs - 1, False, delta, cfg.codeblock_size)
        for (p, _) in stacks]
    jax.block_until_ready([p[1] for p in pendings])
    print(f"{'DWT+quant+tile (device)':34s} {time.time()-t0:7.3f}s")
    t0 = time.time()
    selecteds = [frame_codec.encode_frames_select_sparse(pend, mt)
                 for pend, (_, mt) in zip(pendings, stacks)]
    jax.block_until_ready([s[1] for s in selecteds])
    nb = sum(int(np.prod(np.asarray(s[1]).shape)) * 2 for s in selecteds)
    print(f"{'select+gather (device)':34s} {time.time()-t0:7.3f}s  ({nb/1e6:.1f} MB selected)")
    t0 = time.time()
    datas = [np.asarray(s[1]) for s in selecteds]
    print(f"{'fetch compact tiles':34s} {time.time()-t0:7.3f}s")
    t0 = time.time()
    encs = []
    for s, d_, pend, (_, mt) in zip(selecteds, datas, pendings, stacks):
        H, W = pend[0].shape[1], pend[0].shape[2]
        s = (s[0], d_) + s[2:]
        encs.append(frame_codec.encode_frames_finish_sparse(s, H, W, mt, "bp"))
    print(f"{'native bp encode (host)':34s} {time.time()-t0:7.3f}s")
    tot = time.time() - T0
    print(f"{'TOTAL':34s} {tot:7.3f}s  = {vid.frames/tot:.2f} fps")
