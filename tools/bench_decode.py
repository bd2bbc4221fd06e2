"""Decode-side throughput at the bench config (BASELINE.json's metric
mentions encode+decode; BASELINE.md's 30 fps target is encode-only).

Measures `api.expand_gops` wall clock over the 4-GOP 1080p streams the
encoder produces: host entropy decode of every code-block, upload of the
packed coefficient planes (int16 — tunnel-bandwidth-bound in this dev
environment, see PROFILE.md), and the fused device dequant+IDWT+inverse
MCTF.  Prints one JSON line.

Run from the repo root:  python tools/bench_decode.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import jax
    from qsvc_tpu.utils import cachedir
    cachedir.configure(jax, os.path.abspath(".jax_cache"))
    from qsvc_tpu import api
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video

    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=4,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)
    streams = api.compress_gops(vid, cfg, reversible=False)

    t0 = time.time()
    api.prewarm_decode(cfg, reversible=False)
    rec = api.expand_gops(streams)
    warm = time.time() - t0
    t0 = time.time()
    rec = api.expand_gops(streams)
    dt = time.time() - t0
    fps = vid.frames / dt

    # staged convention (mirror of the encode bench): streams in host
    # memory -> device-resident uint8 frames, block_until_ready; the
    # final download is environment transport measured by the e2e number
    t0 = time.time()
    for s in streams:
        api.expand(s, to_host=False)
    sdt = time.time() - t0
    sfps = vid.frames / sdt
    row = {
        "metric": "1080p_gop16_decode_fps_per_chip",
        "value": round(sfps, 3),
        "unit": "fps",
        "detail": {"frames": vid.frames, "seconds": round(sdt, 2),
                   "e2e_tunnel_fps": round(fps, 3),
                   "e2e_seconds": round(dt, 2),
                   "warmup_seconds": round(warm, 2),
                   "device": str(jax.devices()[0])},
    }
    print(json.dumps(row))
    if len(sys.argv) > 1:               # optional artifact path
        with open(sys.argv[1], "w") as f:
            json.dump(row, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
