"""Overlapped-block (OLA) prediction smoothing (decorrelate.cpp:69-189)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qsvc_tpu import api
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video, video_psnr
from qsvc_tpu.mctf import predict


def _seam_energy(img: np.ndarray, bs: int) -> float:
    """Mean |gradient| across block boundaries."""
    rows = np.abs(np.diff(img.astype(np.int64), axis=0))[bs - 1::bs]
    cols = np.abs(np.diff(img.astype(np.int64), axis=1))[:, bs - 1::bs]
    return float(rows.mean() + cols.mean())


def test_ola_smooths_block_seams(rng):
    """A blocky motion field over smooth content produces visible seams;
    the OLA path reduces them."""
    H, W, bs, d = 64, 128, 16, 4
    yy, xx = np.mgrid[0:H, 0:W]
    smooth = (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)
              ).astype(np.int32)
    refs = jnp.asarray(np.broadcast_to(smooth, (1, 3, H, W)).astype(np.int16))
    By, Bx = H // bs, W // bs
    # checkerboard +-2px vectors -> adjacent blocks pull different texture
    mv = np.zeros((1, 2, 2, By, Bx), np.int32)
    mv[0, :, 0] = np.where((np.add.outer(np.arange(By),
                                         np.arange(Bx)) % 2), 2, -2)
    mv = jnp.asarray(mv)
    plain = np.asarray(predict.predict_frames_batch(
        refs, refs, mv, bs, 4, 0))[0, 0]
    ola = np.asarray(predict.predict_frames_batch(
        refs, refs, mv, bs, 4, d))[0, 0]
    e_plain = _seam_energy(plain, bs)
    e_ola = _seam_energy(ola, bs)
    assert e_ola < e_plain * 0.75, (e_plain, e_ola)


def test_ola_close_to_plain_on_uniform_motion(rng):
    """With a constant motion field there are no seams to fix: OLA's
    per-block analyze/crop/stitch/synthesize stays close to the plain
    shifted prediction (not exact — the per-window DWT keeps boundary
    folds near each crop edge, as in the reference's per-block
    ``overlap_dwt`` analysis, decorrelate.cpp:111-189)."""
    H, W, bs, d = 64, 128, 16, 4
    img = rng.integers(0, 256, (1, 3, H, W)).astype(np.int16)
    refs = jnp.asarray(img)
    By, Bx = H // bs, W // bs
    mv = jnp.asarray(np.full((1, 2, 2, By, Bx), 3, np.int32))
    plain = np.asarray(predict.predict_frames_batch(
        refs, refs, mv, bs, 4, 0))[0]
    ola = np.asarray(predict.predict_frames_batch(
        refs, refs, mv, bs, 4, d))[0]
    m = 2 * d
    diff = np.abs(ola[:, m:-m, m:-m].astype(np.int64)
                  - plain[:, m:-m, m:-m])
    assert diff.mean() < 4.0 and diff.max() < 32, (diff.mean(), diff.max())


def test_roundtrip_ola_exact():
    """compress -> expand bit-exact with OLA on (reversible texture, no
    truncation, update_factor=0): enc/dec share the OLA prediction."""
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=3, GOPs=1,
                      SRLs=3, block_size=16, search_range=2,
                      block_overlaping=4, quantization_texture=0,
                      update_factor=0.0)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=5)
    vs = api.compress(vid, cfg, reversible=True)
    rec = api.expand(vs)
    np.testing.assert_array_equal(rec.y, vid.y)
    np.testing.assert_array_equal(rec.u, vid.u)
    np.testing.assert_array_equal(rec.v, vid.v)


def test_roundtrip_ola_subpixel_lossy():
    """OLA composes with sub-pixel MC (reference predict() call site:
    block_overlaping << subpixel_accuracy, decorrelate.cpp:828-838)."""
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=2, GOPs=2,
                      SRLs=3, block_size=16, search_range=2,
                      block_overlaping=2, subpixel_accuracy=1,
                      quantization_texture=43000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=6)
    vs = api.compress(vid, cfg, reversible=False)
    # the byte round trip must carry the MC parameters (v3 header): a
    # decoder without subpixel/overlap would mis-predict
    from qsvc_tpu.codec.codestream import VideoStream
    vs2 = VideoStream.from_bytes(vs.to_bytes())
    assert vs2.cfg.subpixel_accuracy == 1
    assert vs2.cfg.block_overlaping == 2
    rec = api.expand(vs2)
    p = video_psnr(vid, rec)
    assert min(p) > 30.0, p


def test_validate_rejects_bad_overlap():
    with pytest.raises(ValueError):
        CodecConfig(block_overlaping=3, block_size=16).validate()
    with pytest.raises(ValueError):
        CodecConfig(block_overlaping=16, block_size=16).validate()
