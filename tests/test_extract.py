"""Scalable extraction: QS layers, TS/SS truncation, BRC rate targeting,
info accounting."""

import numpy as np
import pytest

from qsvc_tpu.api import compress, expand
from qsvc_tpu.codec.codestream import VideoStream
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video, video_psnr
from qsvc_tpu.scal import extract, info


@pytest.fixture(scope="module")
def encoded():
    cfg = CodecConfig(pixels_in_x=96, pixels_in_y=80, TRLs=3, GOPs=1,
                      block_size=16, search_range=4, update_factor=0.0,
                      quantization_texture=0, SRLs=3, nLayers=5)
    vid = synthetic_video(cfg.pictures, 80, 96, seed=11)
    vs = compress(vid, cfg, reversible=False, lossless=True)
    return cfg, vid, vs


def test_clayers_monotone(encoded):
    cfg, vid, vs = encoded
    prev = -1.0
    prev_bytes = 0
    for c in (1, 3, 5):
        t = extract.quality_truncate(vs, clayers=c)
        nbytes = len(t.to_bytes())
        rec = expand(t)
        p = video_psnr(vid, rec)[0]
        assert nbytes >= prev_bytes
        assert p >= prev - 0.2, (c, p, prev)
        prev, prev_bytes = p, nbytes


def test_temporal_extraction_standalone(encoded):
    cfg, vid, vs = encoded
    t = extract.temporal_truncate(vs, 1)
    data = t.to_bytes()
    t2 = VideoStream.from_bytes(data)
    assert t2.cfg.TRLs == cfg.TRLs - 1
    rec = expand(t2)
    assert rec.frames == cfg.pictures // 2 + 1
    np.testing.assert_array_equal(rec.y, vid.y[0::2])


def test_spatial_extraction(encoded):
    cfg, vid, vs = encoded
    s = extract.spatial_truncate(vs, 1)
    data = s.to_bytes()
    s2 = VideoStream.from_bytes(data)
    assert s2.cfg.pixels_in_x == 48 and s2.cfg.pixels_in_y == 40
    rec = expand(s2)
    assert rec.y.shape == (cfg.pictures, 40, 48)
    # half-resolution decode should resemble the downsampled source
    from qsvc_tpu.ops import dwt2d
    import jax.numpy as jnp
    ref = np.asarray(dwt2d.ll_view(
        dwt2d.analyze(jnp.asarray(vid.y.astype(np.int32)) - 128, 1, "9/7"
                      if not vs.reversible else "5/3"), 1)) + 128
    mse = np.mean((rec.y.astype(float) - np.clip(ref, 0, 255)) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 25, psnr

def test_brc_rate_targeting(encoded):
    cfg, vid, vs = encoded
    full = len(vs.to_bytes())
    for alg in ("FS", "PTS", "ITS", "PTL", "AmPTL", "SR", "ISR"):
        target = full // 3
        t = extract.select_for_rate(vs, target, alg)
        got = sum(b for b in t.texture_bytes().values()) + \
            sum(b for b in t.motion_bytes().values())
        assert got <= target * 1.05, (alg, got, target)
        rec = expand(t)
        p = video_psnr(vid, rec)[0]
        assert p > 15, (alg, p)


def test_fs_beats_or_matches_others_at_rate(encoded):
    cfg, vid, vs = encoded
    full = len(vs.to_bytes())
    target = full // 3
    scores = {}
    for alg in ("FS", "PTS", "PTL", "AmPTL"):
        t = extract.select_for_rate(vs, target, alg)
        scores[alg] = video_psnr(vid, expand(t))[0]
    assert scores["FS"] >= max(scores.values()) - 0.5, scores


def test_info_accounting(encoded):
    cfg, vid, vs = encoded
    si = info.stream_info(vs, fps=30.0)
    assert si.total_bytes > 0
    assert set(si.texture_bytes) == {"L", "H1", "H2"}
    assert set(si.motion_bytes) == {"M1", "M2"}
    table = info.format_table(si)
    assert "kbps" in table and "H1" in table
    assert si.kbps == pytest.approx(
        si.total_bytes * 8 / 1000 / (cfg.pictures / 30.0))
