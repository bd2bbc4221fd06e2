"""Per-stage wall-clock attribution of the 1080p encode (bench config).

Under the axon-tunneled TPU, ``jax.block_until_ready`` does not wait for
remote execution — only a host fetch does.  Every stage here is therefore
forced with a tiny scalar ``device_get`` so the attribution is honest
(the scalar transfer itself is sub-millisecond).

Run from the repo root:  python tools/profile_stages.py
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from qsvc_tpu.api import compress
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.mctf import transform, motion_coding
from qsvc_tpu.codec import frame_codec, fast
from qsvc_tpu.codec.frame_codec import slope_to_threshold


def force(x):
    """Force remote execution: fetch one scalar of a device array."""
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            flat = leaf.reshape(-1)[:1] if leaf.ndim else leaf
            jax.device_get(flat)


def main():
    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)

    t0 = time.time()
    vs = compress(vid, cfg, reversible=False)
    print(f"warmup compress: {time.time()-t0:.1f}s; "
          f"bytes={len(vs.to_bytes())}", flush=True)

    t = slope_to_threshold(45000.0)
    delta = float(np.clip(math.sqrt(t) / 8.0, 0.125, 8.0))
    slopes = cfg.slopes()

    for rep in range(2):
        print(f"--- rep {rep}", flush=True)
        T0 = time.time()

        t0 = time.time()
        y = jnp.asarray(np.asarray(vid.y, np.uint8))
        u = jnp.asarray(np.asarray(vid.u, np.uint8))
        v = jnp.asarray(np.asarray(vid.v, np.uint8))
        force((y, u, v))
        print(f"{'upload uint8 (53 MB)':34s} {time.time()-t0:7.3f}s",
              flush=True)

        t0 = time.time()
        stream = transform.analyze_jit(y, u, v, cfg)
        force(stream)
        print(f"{'MCTF analyze (device)':34s} {time.time()-t0:7.3f}s",
              flush=True)

        def thr(row):
            return slope_to_threshold(slopes[row][0])

        stacks = [(stream.low_y, thr(0)), (stream.low_u, thr(0)),
                  (stream.low_v, thr(0))]
        for tt, lev in enumerate(stream.levels, start=1):
            mt = thr(cfg.TRLs - tt)
            stacks += [(lev.high_y, mt), (lev.high_u, mt), (lev.high_v, mt)]

        t0 = time.time()
        pendings = [frame_codec.encode_frames_dispatch_sparse(
            p, cfg.SRLs - 1, False, delta, cfg.codeblock_size, mt, "bp")
            for (p, mt) in stacks]
        force([p[1] for p in pendings])        # compact tiles ready
        print(f"{'DWT+quant+tile (device)':34s} {time.time()-t0:7.3f}s",
              flush=True)

        t0 = time.time()
        force([p[3] for p in pendings])        # keep: bp R-D sim done
        print(f"{'bp R-D sim (device)':34s} {time.time()-t0:7.3f}s",
              flush=True)

        t0 = time.time()
        selecteds = [frame_codec.encode_frames_select_sparse(pend, mt, "bp")
                     for pend, (_, mt) in zip(pendings, stacks)]
        force([s[1] for s in selecteds])
        print(f"{'select+gather (device)':34s} {time.time()-t0:7.3f}s",
              flush=True)

        t0 = time.time()
        datas = [np.asarray(s[1]) for s in selecteds]
        nb = sum(d.nbytes for d in datas)
        print(f"{'fetch compact tiles':34s} {time.time()-t0:7.3f}s  "
              f"({nb/1e6:.1f} MB)", flush=True)

        t0 = time.time()
        mv_fields = [lev.mv for lev in stream.levels]
        residues = jax.device_get(motion_coding.decorrelate_jit(mv_fields))
        print(f"{'motion decorrelate+fetch':34s} {time.time()-t0:7.3f}s",
              flush=True)

        t0 = time.time()
        encs = []
        for sel, d, pend, (_, mt) in zip(selecteds, datas, pendings, stacks):
            H, W = pend[0].shape[1], pend[0].shape[2]
            sel = sel[:1] + (d,) + sel[2:]
            encs.append(frame_codec.encode_frames_finish_sparse(
                sel, H, W, mt, "bp"))
        print(f"{'native bp encode (host)':34s} {time.time()-t0:7.3f}s",
              flush=True)

        total = time.time() - T0
        print(f"{'TOTAL':34s} {total:7.3f}s  = "
              f"{vid.frames/total:.2f} fps", flush=True)


if __name__ == "__main__":
    main()
