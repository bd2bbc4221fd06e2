"""Slope-unit calibration and cross-axis composition.

Pins the SLOPE_ANCHOR mapping empirically (the reference's useful
42000-46000 Kakadu-style range, texture_compress.py:45, must span from
near-transparent to very low rate) and the QS+SS+BRC composition the
round-1 review flagged as untested.
"""

import numpy as np
import pytest

from qsvc_tpu import api
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video, video_psnr
from qsvc_tpu.scal import extract


@pytest.fixture(scope="module")
def encoded():
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=3, GOPs=2,
                      SRLs=4, block_size=16, search_range=2,
                      quantization_texture=43000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=8)
    return cfg, vid, api.compress(vid, cfg, reversible=False)


def test_slope_range_calibration(encoded):
    """Across the reference's useful slope range the rate must fall
    monotonically and span a wide ratio: 42000 near-transparent (high
    rate) -> 46000 very low rate (SLOPE_ANCHOR calibration contract,
    frame_codec.py)."""
    cfg, vid, vs = encoded
    sizes = []
    psnrs = []
    for u in (42000, 43500, 45000, 46000):
        out = extract.quality_truncate(vs, quantization=u)
        sizes.append(len(out.to_bytes()))
        rec = api.expand(out)
        psnrs.append(video_psnr(vid, rec)[0])
    assert sizes == sorted(sizes, reverse=True), sizes
    assert psnrs == sorted(psnrs, reverse=True), psnrs
    assert sizes[0] > 3 * sizes[-1], sizes          # wide dynamic range
    assert psnrs[0] > 38.0, psnrs                   # near-transparent end
    assert psnrs[0] - psnrs[-1] > 6.0, psnrs        # real quality spread


def test_spatial_plus_quality_plus_brc(encoded):
    """SS, then QS layers, then rate-targeted BRC compose on one stream."""
    cfg, vid, vs = encoded
    ss = extract.spatial_truncate(vs, 1)
    qs = extract.quality_truncate(ss, clayers=4)
    base = len(qs.to_bytes())
    out = extract.select_for_rate(qs, int(base * 0.6), algorithm="FS")
    got = len(out.to_bytes())
    assert got <= base
    rec = api.expand(out)
    assert rec.y.shape == (cfg.pictures, cfg.pixels_in_y // 2,
                           cfg.pixels_in_x // 2)
