"""Benchmark: 1080p full-pipeline encode throughput on one chip.

Measures the BASELINE.md headline config (config 3): 1080p GOP=16 MCTF +
spatial DWT on device + EBCOT entropy coding on host, at the default
operating point (slope 45000).  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/30}

vs_baseline is against the 30 fps/chip target (the reference publishes no
throughput numbers; see BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    from qsvc_tpu.api import compress
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video

    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)

    # warmup: compile the device graphs and prime the native library
    t0 = time.time()
    vs = compress(vid, cfg, reversible=False)
    warm = time.time() - t0

    t0 = time.time()
    vs = compress(vid, cfg, reversible=False)
    dt = time.time() - t0
    fps = vid.frames / dt

    nbytes = len(vs.to_bytes())
    raw = vid.y.size * 3 // 2
    print(json.dumps({
        "metric": "1080p_gop16_encode_fps_per_chip",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "detail": {
            "frames": vid.frames,
            "seconds": round(dt, 2),
            "warmup_seconds": round(warm, 2),
            "bpp": round(nbytes * 8 / raw, 3),
            "device": str(jax.devices()[0]),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
