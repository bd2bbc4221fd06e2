"""End-to-end pipeline: compress -> serialize -> parse -> expand, across
the BASELINE.json config ladder (intra lossless, MCTF lossy, extraction)."""

import numpy as np
import pytest

from qsvc_tpu.api import compress, compress_bytes, expand, expand_bytes
from qsvc_tpu.codec.codestream import VideoStream
from qsvc_tpu.codec.frame_codec import slope_to_threshold
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video, video_psnr


def test_intra_lossless_bitexact():
    # BASELINE config 1: 8-frame QCIF intra-only, 5/3 + EBCOT lossless
    cfg = CodecConfig(pixels_in_x=176, pixels_in_y=144, TRLs=1, SRLs=3,
                      quantization_texture=0)
    vid = synthetic_video(8, 144, 176, seed=2)
    data = compress_bytes(vid, cfg)
    rec = expand_bytes(data)
    np.testing.assert_array_equal(rec.y, vid.y)
    np.testing.assert_array_equal(rec.u, vid.u)
    np.testing.assert_array_equal(rec.v, vid.v)
    assert len(data) < vid.y.size * 1.5 * 2   # compresses vs raw


def test_mctf_lossless_texture_roundtrip():
    cfg = CodecConfig(pixels_in_x=96, pixels_in_y=80, TRLs=3, GOPs=1,
                      block_size=16, search_range=4, update_factor=0.0,
                      quantization_texture=0, SRLs=3)
    vid = synthetic_video(cfg.pictures, 80, 96, seed=3)
    vs = compress(vid, cfg)
    rec = expand(vs)
    # update_factor=0 + lossless texture -> bit exact through MCTF
    np.testing.assert_array_equal(rec.y, vid.y)
    np.testing.assert_array_equal(rec.u, vid.u)
    np.testing.assert_array_equal(rec.v, vid.v)


def test_serialization_roundtrip():
    cfg = CodecConfig(pixels_in_x=96, pixels_in_y=80, TRLs=2, GOPs=1,
                      block_size=16, search_range=4, update_factor=0.25,
                      quantization_texture=0, SRLs=3)
    vid = synthetic_video(cfg.pictures, 80, 96, seed=4)
    vs = compress(vid, cfg)
    data = vs.to_bytes()
    vs2 = VideoStream.from_bytes(data)
    assert vs2.cfg.TRLs == cfg.TRLs
    assert vs2.cfg.pixels_in_x == cfg.pixels_in_x
    rec1 = expand(vs)
    rec2 = expand(vs2)
    np.testing.assert_array_equal(rec1.y, rec2.y)
    np.testing.assert_array_equal(rec1.u, rec2.u)


@pytest.mark.parametrize("coder,bpp_cap", [("mq", 4.0), ("bp", 5.2)])
def test_lossy_mctf_quality(coder, bpp_cap):
    # BASELINE config 2 shape: CIF-ish MCTF GOP=4, 9/7 lossy
    cfg = CodecConfig(pixels_in_x=176, pixels_in_y=144, TRLs=3, GOPs=1,
                      block_size=16, search_range=4, update_factor=0.25,
                      quantization_texture=43000, SRLs=4,
                      texture_coder=coder)
    vid = synthetic_video(cfg.pictures, 144, 176, seed=5)
    vs = compress(vid, cfg, reversible=False)
    data = vs.to_bytes()
    rec = expand(VideoStream.from_bytes(data))
    py, pu, pv = video_psnr(vid, rec)
    raw = vid.y.size + vid.u.size + vid.v.size
    bpp = len(data) * 8 / raw
    assert py > 28, (py, bpp)
    assert bpp < bpp_cap, bpp


def test_quality_extraction_monotone():
    cfg = CodecConfig(pixels_in_x=96, pixels_in_y=80, TRLs=2, GOPs=1,
                      block_size=16, search_range=4, update_factor=0.25,
                      quantization_texture=0, SRLs=3)
    vid = synthetic_video(cfg.pictures, 80, 96, seed=6)
    vs = compress(vid, cfg, reversible=False, lossless=True)
    prev_psnr = 0.0
    prev_bytes = 0
    results = []
    for u in (45500, 44000, 0):
        thr = slope_to_threshold(u) if u else 0.0
        rec = expand(vs, threshold=thr)
        p = video_psnr(vid, rec)[0]
        results.append((u, p))
    assert results[0][1] <= results[1][1] + 0.2 <= results[2][1] + 0.4, results


def test_temporal_extraction():
    cfg = CodecConfig(pixels_in_x=96, pixels_in_y=80, TRLs=3, GOPs=1,
                      block_size=16, search_range=4, update_factor=0.0,
                      quantization_texture=0, SRLs=3)
    vid = synthetic_video(cfg.pictures, 80, 96, seed=7)
    vs = compress(vid, cfg)
    half = expand(vs, discard_TRLs=1)
    assert half.frames == cfg.pictures // 2 + 1
    # the kept frames are the even (temporal low) frames; with
    # update_factor=0 they equal the source evens exactly
    np.testing.assert_array_equal(half.y, vid.y[0::2])
    quarter = expand(vs, discard_TRLs=2)
    assert quarter.frames == cfg.pictures // 4 + 1
    np.testing.assert_array_equal(quarter.y, vid.y[0::4])


def test_prewarm_covers_production_programs():
    """prewarm / prewarm_decode compile the encode/decode programs from
    zero-filled inputs of the production shapes; the real pipeline after
    them must produce identical results to a cold pipeline (same
    programs, just compiled early)."""
    from qsvc_tpu import api
    cfg = CodecConfig(pixels_in_x=96, pixels_in_y=80, TRLs=3, GOPs=1,
                      block_size=16, search_range=2, update_factor=0.25,
                      quantization_texture=45000, SRLs=3)
    api.prewarm(cfg, reversible=False)
    api.prewarm_decode(cfg, reversible=False)
    vid = synthetic_video(cfg.pictures, 80, 96, seed=11)
    vs = compress(vid, cfg, reversible=False)
    rec = expand(vs)
    assert video_psnr(vid, rec)[0] > 25
