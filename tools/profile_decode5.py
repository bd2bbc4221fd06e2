"""Round-5 decode attribution: split the ~1.1 s/GOP 'host entropy
decode + scatter + idwt' residual of DECODE_r04 into its parts using the
trace subsystem hooks inside frame_codec.decode_frames / api.expand.

Run from the repo root on the real chip:  python tools/profile_decode5.py
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
    from qsvc_tpu.utils import trace

    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=4,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)
    t0 = time.time()
    streams = api.compress_gops(vid, cfg, reversible=False)
    print(f"encode: {time.time()-t0:.1f}s", flush=True)

    # warm the decode programs
    t0 = time.time()
    api.expand(streams[0], to_host=False)
    print(f"decode warmup: {time.time()-t0:.1f}s", flush=True)

    log = trace.RunLog()
    trace.set_run_log(log)
    t0 = time.time()
    for s in streams:
        api.expand(s, to_host=False)
    dt = time.time() - t0
    trace.set_run_log(None)
    fps = vid.frames / dt
    summary = {k: round(v, 3) for k, v in sorted(log.summary().items())}
    nblocks = sum(r.get("blocks", 0) for r in log.records)
    print(json.dumps({"staged_seconds": round(dt, 2),
                      "staged_fps": round(fps, 2),
                      "gops": len(streams),
                      "blocks_total": nblocks,
                      "stages_total_s": summary}, indent=1), flush=True)
    # per-stage-records detail for the biggest stage
    for name in ("decode.native", "decode.dispatch", "decode.pack"):
        recs = [r for r in log.records if r.get("stage") == name]
        tot = sum(r["seconds"] for r in recs)
        print(f"{name}: n={len(recs)} total={tot:.3f}s "
              f"max={max((r['seconds'] for r in recs), default=0):.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
