"""Sub-stage attribution of the MCTF analyze at the 1080p bench config.

Forces remote execution per stage with a tiny fetch (see
profile_stages.py for why block_until_ready is not enough under the
tunneled device).  First rep pays compiles; read the LAST rep.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.mctf import transform, me, predict, update
from qsvc_tpu.ops import dwt2d
from qsvc_tpu.ops.entropy import histogram_entropy


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[:1])


def timed(label, fn, *args, reps=2):
    out = None
    for r in range(reps):
        t0 = time.time()
        out = fn(*args)
        force(out)
        dt = time.time() - t0
    print(f"{label:40s} {dt:7.3f}s", flush=True)
    return out


def main():
    cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                      SRLs=5, search_range=4, update_factor=0.25,
                      quantization_texture=45000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=0)
    y = jnp.asarray(vid.y.astype(np.int32))
    u = jnp.asarray(vid.u.astype(np.int32))
    v = jnp.asarray(vid.v.astype(np.int32))
    force((y, u, v))

    timed("analyze full (4 levels)", lambda: transform.analyze_jit(
        y, u, v, cfg))

    lp = cfg.level_schedule()[0]
    ey, oy = y[0::2], y[1::2]
    eu, ev_ = u[0::2], v[0::2]
    ou, ov = u[1::2], v[1::2]
    force((ey, oy))

    # --- ME level 1 (8 pairs) and its pieces
    mv = timed("ME level1 (8 pairs)", jax.jit(partial(
        me.estimate_sequence, block_size=lp.block_size,
        search_range=lp.search_range, border_size=cfg.border_size,
        subpixel_accuracy=0)), ey, oy)

    pyr = timed("  ME pyramid (1 level DWT x3 imgs)", jax.jit(
        lambda a, b, c: tuple(dwt2d.ll_view(dwt2d.analyze(x, 1), 1)
                              for x in (a, b, c))), oy, ey[:-1], ey[1:])

    refine = jax.jit(lambda p, rp, rn, m: jax.vmap(partial(
        me._refine_level, block_size=lp.block_size, border=cfg.border_size,
        ny=1088, nx=1920, max_mv=lp.search_range))(p, rp, rn, m))
    timed("  ME refine_level @full-res", refine, oy, ey[:-1], ey[1:], mv)

    # --- predict pieces
    e444 = timed("refs_to_444 (9 evens)", jax.jit(
        lambda a, b, c: transform._refs444(a, b, c)), ey, eu, ev_)

    dec_fn = jax.jit(lambda o, e0, e1, m: jax.vmap(partial(
        predict.decorrelate_pair, block_size=lp.block_size,
        search_range=lp.search_range, block_overlaping=0,
        always_B=False))(o, e0, e1, m))
    dec = timed("decorrelate level1 (8 pairs)", dec_fn,
                (oy, ou, ov), e444[:-1], e444[1:], mv)

    pf = jax.jit(lambda e0, e1, m: jax.vmap(partial(
        predict.predict_frame, block_size=lp.block_size,
        border=4 * lp.search_range))(e0, e1, m))
    timed("  predict_frame only", pf, e444[:-1], e444[1:], mv)

    timed("  downsample_chroma x2", jax.jit(
        lambda p: (jax.vmap(predict.downsample_chroma)(p[:, 1]),
                   jax.vmap(predict.downsample_chroma)(p[:, 2]))), e444[:-1])

    timed("  histogram_entropy x3", jax.jit(
        lambda a: (jax.vmap(histogram_entropy)(a),
                   jax.vmap(histogram_entropy)(a + 1),
                   jax.vmap(histogram_entropy)(a + 2))), oy)

    # --- update pieces
    res_fn = jax.jit(lambda hy, hu, hv, isb: jax.vmap(update.residue_to_444)(
        (hy, hu, hv), isb[:, None, None, None]))
    res = timed("residue_to_444", res_fn, dec.high_y, dec.high_u,
                dec.high_v, dec.is_B)
    upd_fn = jax.jit(lambda r, my, mx: jax.vmap(partial(
        update._update_field, block_size=lp.block_size,
        update_factor=0.25, search_range=lp.search_range))(r, my, mx))
    timed("update_field one direction", upd_fn, res,
          dec.mv_out[:, 0, 0], dec.mv_out[:, 0, 1])


if __name__ == "__main__":
    main()
