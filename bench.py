"""Benchmark: 1080p full-pipeline encode throughput on one chip.

Measures the BASELINE.md headline config (config 3): 1080p GOP=16 MCTF +
spatial DWT + device R-D simulation + native EBCOT entropy coding, at the
default operating point (slope 45000), in the pipelined streaming mode
(one self-contained stream per GOP, uploads overlapped with device
compute).  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/30}

vs_baseline is against the 30 fps/chip target (the reference publishes no
throughput numbers; see BASELINE.md).  ``detail.staged_fps`` additionally
reports throughput with the frames already resident on the device — the
relevant number when ingest does not ride the development tunnel (~40 MB/s
host->device here; production ingest is NIC/PCIe-speed).  See PROFILE.md.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    # persistent compile cache: the flagship-config programs take minutes
    # to compile; cache them on disk so repeat bench runs (and production
    # restarts) skip the warmup (gitignored; safe to delete any time)
    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from qsvc_tpu import api
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video

    GOPS = 3
    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=GOPS,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)

    # warmup: compile the device graphs (persistent cache cuts repeats)
    t0 = time.time()
    streams = api.compress_gops(vid, cfg, reversible=False)
    warm = time.time() - t0

    # end-to-end steady state: host frames -> encoded streams
    t0 = time.time()
    streams = api.compress_gops(vid, cfg, reversible=False)
    dt = time.time() - t0
    fps = vid.frames / dt

    # device-staged: frames already on the chip (isolates the encoder from
    # the development tunnel's ~40 MB/s ingest)
    S = cfg.gop_size
    gop_cfg = cfg.replace(GOPs=1)
    from qsvc_tpu.io.yuv import Video
    chunks = [Video(vid.y[g * S:(g + 1) * S + 1],
                    vid.u[g * S:(g + 1) * S + 1],
                    vid.v[g * S:(g + 1) * S + 1]) for g in range(GOPS)]
    staged = [Video(jnp.asarray(c.y), jnp.asarray(c.u), jnp.asarray(c.v))
              for c in chunks]
    for c in staged:
        jax.device_get(c.y.ravel()[:1])
    t0 = time.time()
    pend = [api.compress_dispatch(c, gop_cfg, reversible=False)
            for c in staged]
    _ = [api.compress_finish(p) for p in pend]
    staged_dt = time.time() - t0
    staged_fps = vid.frames / staged_dt

    nbytes = sum(len(s.to_bytes()) for s in streams)
    raw = vid.y.size * 3 // 2
    print(json.dumps({
        "metric": "1080p_gop16_encode_fps_per_chip",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "detail": {
            "frames": vid.frames,
            "gops": GOPS,
            "seconds": round(dt, 2),
            "warmup_seconds": round(warm, 2),
            "staged_fps": round(staged_fps, 3),
            "bpp": round(nbytes * 8 / raw, 3),
            "device": str(jax.devices()[0]),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
