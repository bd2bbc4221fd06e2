import time, numpy as np, jax
from qsvc_tpu.api import compress
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                  SRLs=5, search_range=4, update_factor=0.25,
                  quantization_texture=45000)
vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x, seed=0)
print("video ready", flush=True)
t0=time.time(); vs = compress(vid, cfg, reversible=False)
print(f"warm {time.time()-t0:.2f}s bytes={len(vs.to_bytes())}", flush=True)
for i in range(2):
    t0=time.time(); vs = compress(vid, cfg, reversible=False)
    dt=time.time()-t0
    print(f"rep{i} {dt:.2f}s = {vid.frames/dt:.2f} fps", flush=True)
