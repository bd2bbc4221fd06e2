"""Sub-pixel motion estimation / compensation (reference
motion_estimate.cpp:361-407, decorrelate.cpp:656-686,828-861)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qsvc_tpu import api
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video, video_psnr, Video
from qsvc_tpu.mctf import me, predict
from qsvc_tpu.ops import dwt2d


def _halfpel_shift(img: np.ndarray, dy2: int, dx2: int) -> np.ndarray:
    """Shift an image by (dy2/2, dx2/2) pixels via the codec's own x2
    interpolation (5/3 zero-high synthesis), shift, LL downsample."""
    up = np.asarray(dwt2d.upsample2(jnp.asarray(img.astype(np.int32))))
    up = np.roll(np.roll(up, dy2, axis=0), dx2, axis=1)
    return np.asarray(dwt2d.downsample2(jnp.asarray(up)))


def test_me_recovers_halfpel_shift(rng):
    """A pure half-pixel translation is found by the sub-pixel refine."""
    H, W, bs = 64, 128, 16
    base = rng.integers(0, 256, (H, W)).astype(np.int32)
    base = np.asarray(dwt2d.downsample2(dwt2d.upsample2(jnp.asarray(base))))
    # odd frame = even frame shifted by (+0.5, -0.5) pixels
    odd = _halfpel_shift(base, 1, -1)
    mv = me.estimate_pair(jnp.asarray(odd), jnp.asarray(base),
                          jnp.asarray(base), block_size=bs, search_range=2,
                          subpixel_accuracy=1)
    mv = np.asarray(mv)
    # pred[y,x] ~ ref[y + mvy/2, x + mvx/2]: odd[y,x] = base[y-0.5, x+0.5]
    # => mv (units of 1/2 px) should be (-1, +1) for most interior blocks
    interior = mv[:, :, 1:-1, 1:-1]
    assert (interior[0, 0] == -1).mean() > 0.7, interior[0, 0]
    assert (interior[0, 1] == 1).mean() > 0.7, interior[0, 1]


def test_subpixel_prediction_better_on_halfpel_motion(rng):
    """On true half-pel motion, a=1 prediction beats a=0."""
    H, W, bs = 64, 128, 16
    base = rng.integers(0, 256, (H, W)).astype(np.int32)
    base = np.asarray(dwt2d.downsample2(dwt2d.upsample2(jnp.asarray(base))))
    odd = _halfpel_shift(base, 1, 1)
    refs = jnp.asarray(np.stack([base, base])[None].astype(np.int16))

    mv0 = me.estimate_pair(jnp.asarray(odd), jnp.asarray(base),
                           jnp.asarray(base), bs, 2, subpixel_accuracy=0)
    p0 = predict.predict_frames_subpixel(
        refs[:, :1].repeat(3, 1), refs[:, 1:].repeat(3, 1), mv0[None],
        bs, 2, 0)
    mv1 = me.estimate_pair(jnp.asarray(odd), jnp.asarray(base),
                           jnp.asarray(base), bs, 2, subpixel_accuracy=1)
    p1 = predict.predict_frames_subpixel(
        refs[:, :1].repeat(3, 1), refs[:, 1:].repeat(3, 1), mv1[None],
        bs, 2, 1)
    e0 = float(np.abs(np.asarray(p0)[0, 0].astype(np.int64) - odd).mean())
    e1 = float(np.abs(np.asarray(p1)[0, 0].astype(np.int64) - odd).mean())
    assert e1 < e0 * 0.8, (e0, e1)


@pytest.mark.parametrize("a", [1, 2])
def test_roundtrip_subpixel_exact(a):
    """compress -> expand is bit-exact (reversible texture, no
    truncation, update_factor=0) with sub-pixel MC on: enc/dec share the
    same interpolated prediction, so the predict lifting inverts exactly.
    (With update on, exactness holds only where the [0,255] update clamp
    does not engage — same as whole-pixel MC; see mctf/update.py.)"""
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=3, GOPs=1,
                      SRLs=3, block_size=16, search_range=2,
                      subpixel_accuracy=a, quantization_texture=0,
                      update_factor=0.0)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=11)
    vs = api.compress(vid, cfg, reversible=True)
    rec = api.expand(vs)
    np.testing.assert_array_equal(rec.y, vid.y)
    np.testing.assert_array_equal(rec.u, vid.u)
    np.testing.assert_array_equal(rec.v, vid.v)


def test_roundtrip_subpixel_lossy():
    """Full default pipeline (update on, 9/7, slope truncation) stays
    high-quality with sub-pixel MC."""
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=3, GOPs=1,
                      SRLs=3, block_size=16, search_range=2,
                      subpixel_accuracy=1, quantization_texture=43000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=11)
    vs = api.compress(vid, cfg, reversible=False)
    rec = api.expand(vs)
    p = video_psnr(vid, rec)
    assert min(p) > 30.0, p


def test_validate_rejects_out_of_range():
    with pytest.raises(ValueError):
        CodecConfig(subpixel_accuracy=4).validate()
    with pytest.raises(ValueError):
        CodecConfig(subpixel_accuracy=-1).validate()
