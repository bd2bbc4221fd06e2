import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.mctf import transform, me, predict, update

cfg = CodecConfig(pixels_in_x=1920, pixels_in_y=1088, TRLs=5, GOPs=1,
                  SRLs=5, search_range=4, update_factor=0.25,
                  quantization_texture=45000)
vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x, seed=0)
y = jnp.asarray(vid.y.astype(np.int32)); u = jnp.asarray(vid.u.astype(np.int32)); v = jnp.asarray(vid.v.astype(np.int32))

def t(label, fn, *a, n=3):
    r = fn(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n):
        r = fn(*a); jax.block_until_ready(r)
    print(f"{label:30s} {(time.time()-t0)/n:7.3f}s", flush=True)
    return r

st = t("analyze full", lambda: transform.analyze_jit(y, u, v, cfg))

# level 1 pieces
lp = cfg.level_schedule()[0]
ey, oy = y[0::2], y[1::2]
mv = t("ME level1 (8 pairs)", lambda: me.estimate_sequence(ey, oy, lp.block_size, lp.search_range, cfg.border_size, cfg.subpixel_accuracy))

eu, ev_ = u[0::2], v[0::2]
ou, ov = u[1::2], v[1::2]
refs444 = jax.jit(lambda a,b,c: jax.vmap(lambda x,y2,z: predict.refs_to_444((x,y2,z)))(a,b,c))
e444 = t("refs_to_444 (9 evens)", refs444, ey, eu, ev_)

dec_fn = jax.jit(lambda o, e0, e1, m: jax.vmap(partial(predict.decorrelate_pair, block_size=lp.block_size, search_range=lp.search_range, block_overlaping=0, always_B=False))(o, e0, e1, m))
dec = t("decorrelate level1", dec_fn, (oy, ou, ov), e444[:-1], e444[1:], mv)

res_fn = jax.jit(lambda hy,hu,hv,isb: jax.vmap(update.residue_to_444)((hy,hu,hv), isb[:, None,None,None]))
res = t("residue_to_444", res_fn, dec.high_y, dec.high_u, dec.high_v, dec.is_B)
upd_fn = jax.jit(lambda r, my, mx: jax.vmap(partial(update._update_field, block_size=lp.block_size, update_factor=0.25, search_range=lp.search_range))(r, my, mx))
up = t("update_field prev", upd_fn, res, dec.mv_out[:,0,0], dec.mv_out[:,0,1])
