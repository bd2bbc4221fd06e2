"""Warmup (cold-compile) attribution at the flagship bench config.

BENCH_r03 recorded 238.7 s of cold warmup before the first 1080p frame
— a product property, not just a bench artifact (VERDICT r3 item 6).
This tool times trace (Python -> jaxpr/HLO) and compile (XLA) separately
for every distinct program the encode path builds, then measures whether
compiling them CONCURRENTLY (threads; XLA releases the GIL) cuts the
cold start.

Run:  python tools/profile_warmup.py [--cold] [--parallel]
(--cold ignores the persistent cache by pointing it at a throwaway dir)
"""

import argparse
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--parallel", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = (tempfile.mkdtemp() if args.cold
             else __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np
    from qsvc_tpu import api
    from qsvc_tpu.codec import frame_codec, bp_device
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video
    from qsvc_tpu.mctf import transform, motion_coding

    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)
    y = jnp.asarray(vid.y)
    u = jnp.asarray(vid.u)
    v = jnp.asarray(vid.v)

    # program list: (name, jitted fn, args, kwargs)
    S = cfg.gop_size
    n_l = S + 1            # luma stack frames (low 2 + highs 8+4+2+1)
    n_c = 2 * n_l
    luma = jnp.zeros((n_l, 1088, 1920), jnp.int16)
    chroma = jnp.zeros((n_c, 544, 960), jnp.int16)
    delta, lossless, coder = api._operating_point(cfg, False, None, None)
    cb = cfg.codeblock_size
    mv_shapes = []
    for lp in cfg.level_schedule():
        pairs = lp.pictures // 2
        by = 1088 // lp.block_size
        bx = 1920 // lp.block_size
        mv_shapes.append((pairs, 2, 2, by, bx))
    mvs = [jnp.zeros(s, jnp.int32) for s in mv_shapes]

    progs = [
        ("analyze", transform.analyze_jit, (y, u, v, cfg), {}),
        ("decorrelate_mv", motion_coding.decorrelate_jit, (mvs,), {}),
    ]

    def dispatch_stack(name, pl):
        t0 = time.time()
        pend = frame_codec.encode_frames_dispatch_sparse(
            pl, cfg.SRLs - 1, False, delta, cb, 0.0, coder)
        jax.block_until_ready(pend[1])
        return time.time() - t0

    results = {}
    if args.parallel:
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = {}
            for (name, fn, a, kw) in progs:
                futs[name] = ex.submit(
                    lambda fn=fn, a=a, kw=kw:
                    jax.block_until_ready(fn(*a, **kw)))
            futs["encode_luma"] = ex.submit(dispatch_stack, "l", luma)
            futs["encode_chroma"] = ex.submit(dispatch_stack, "c", chroma)
            for k, f in futs.items():
                f.result()
        print(f"PARALLEL total: {time.time() - t0:.1f}s")
    else:
        for (name, fn, a, kw) in progs:
            t0 = time.time()
            out = fn(*a, **kw)
            jax.block_until_ready(out)
            results[name] = time.time() - t0
            print(f"{name}: {results[name]:.1f}s", flush=True)
        for nm, pl in (("encode_luma", luma), ("encode_chroma", chroma)):
            results[nm] = dispatch_stack(nm, pl)
            print(f"{nm}: {results[nm]:.1f}s", flush=True)
        # finish-side programs (selection slice + gather) ride the same
        # first compress_finish; measure via one full GOP encode
        t0 = time.time()
        api.compress(synthetic_video(cfg.pictures, 1088, 1920, seed=1),
                     cfg, reversible=False)
        print(f"full first-encode after the above: {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
