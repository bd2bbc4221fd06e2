"""info metrics: per-GOP kbps table + exact per-frame MCTF closure
(reference info.py:211-334)."""

import numpy as np
import pytest

from qsvc_tpu import api
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.scal import info


@pytest.fixture(scope="module")
def stream():
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=3, GOPs=2,
                      SRLs=3, block_size=16, search_range=2,
                      quantization_texture=43000, always_B=True)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=4)
    return api.compress(vid, cfg, reversible=False)


def test_gop_table_structure_and_totals(stream):
    si = info.stream_info(stream, fps=30.0)
    rows = si.gop_table()
    cfg = stream.cfg
    assert len(rows) == cfg.GOPs + 1           # GOP0 + one per GOP
    assert rows[0].subbands == []              # GOP0 = first L frame only
    # every (types, M, H) row per GOP covers 2^(s-1) frames coarse->fine
    for row in rows[1:]:
        assert len(row.subbands) == cfg.TRLs - 1
        for s, (ft, m, h) in enumerate(row.subbands):
            assert len(ft) == 1 << s, (row.gop, s, ft)
    # the table's kbps sum equals the stream's totals exactly
    gop_time = cfg.gop_size / 30.0
    total_bytes = sum(r.total_kbps for r in rows[1:]) * 1000 / 8 * gop_time \
        + rows[0].total_kbps * 1000 / 8 * (1 / 30.0)
    assert total_bytes == pytest.approx(si.total_bytes, rel=1e-9)


def test_frame_closure_exactness(stream):
    """Check the closure against hand-derived decode dependency sets."""
    si = info.stream_info(stream, fps=30.0)
    T = stream.cfg.TRLs            # 3: levels H1 (pairs of S0), H2, L
    # frame 0 = L frame 0
    assert si.frame_closure(0) == {("L", 0)}
    # frame 4 = L frame 1 (gop boundary, gop_size=4)
    assert si.frame_closure(4) == {("L", 1)}
    # frame 2 (even at level 0 -> odd at level 1): H2 pair 0 + both L refs
    assert si.frame_closure(2) == {("H", 1, 0), ("L", 0), ("L", 1)}
    # frame 1: H1 pair 0 + refs frames 0 and 2 -> their closures
    assert si.frame_closure(1) == {("H", 0, 0), ("L", 0),
                                   ("H", 1, 0), ("L", 1)}
    # frame 3: H1 pair 1 + refs frames 2 and 4
    assert si.frame_closure(3) == {("H", 0, 1), ("H", 1, 0),
                                   ("L", 0), ("L", 1)}


def test_frame_cost_matches_sections(stream):
    si = info.stream_info(stream, fps=30.0)
    # frame 1 (all-B stream): H1[0]+M1[0] + H2[0]+M2[0] + L[0] + L[1]
    want = (si.per_frame_texture[0][0] + si.per_frame_motion[0][0]
            + si.per_frame_texture[1][0] + si.per_frame_motion[1][0]
            + si.per_frame_texture[2][0] + si.per_frame_texture[2][1])
    assert si.frame_cost(1) == want
    # L frames cost exactly their own texture section
    assert si.frame_cost(0) == si.per_frame_texture[2][0]
    # total-cost sanity: every frame's closure is decodable from the
    # stream, so cost <= total stream bytes
    for n in range(stream.cfg.pictures):
        assert 0 < si.frame_cost(n) <= si.total_bytes


def test_i_frames_cost_texture_only():
    """I frames decode standalone: closure = own texture section."""
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=2, GOPs=1,
                      SRLs=3, block_size=16, search_range=2,
                      quantization_texture=43000)
    # random noise defeats prediction -> decorrelate picks I frames
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=7, kind="random")
    vs = api.compress(vid, cfg, reversible=False)
    si = info.stream_info(vs, fps=30.0)
    if si.frame_types[0][0:1] == b"I":
        assert si.frame_closure(1) == {("H", 0, 0)}
        assert si.frame_cost(1) == si.per_frame_texture[0][0]


def test_format_table_renders_gop_rows(stream):
    txt = info.format_table(info.stream_info(stream, fps=30.0))
    assert "GOP" in txt and "0001" in txt and "0002" in txt
