"""4K joint QS+SS+TS extraction (BASELINE config 5 /
doc/QSVC_stream_organizations.fig): one stream, all three scalability
axes composed, 4096x4096 geometry."""

import numpy as np
import pytest

from qsvc_tpu import api
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video, psnr
from qsvc_tpu.scal import extract, info

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


@pytest.fixture(scope="module")
def stream4k():
    # the reference's largest exercised geometry (sun_4096x4096x30x420x129,
    # tests/busca_parametros) at a CI-runnable frame count
    cfg = CodecConfig(pixels_in_x=4096, pixels_in_y=4096, TRLs=2, GOPs=1,
                      SRLs=5, block_size=64, search_range=4,
                      quantization_texture=44000)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=13)
    vs = api.compress(vid, cfg, reversible=False)
    return cfg, vid, vs


def test_joint_qs_ss_ts(stream4k):
    cfg, vid, vs = stream4k
    full = vs.to_bytes()
    from qsvc_tpu.ops import dwt2d
    import jax.numpy as jnp
    ref = np.clip(np.asarray(dwt2d.ll_view(dwt2d.analyze(
        jnp.asarray(vid.y[0::2].astype(np.int32)) - 128, 2), 2)) + 128,
        0, 255)

    # compose all three axes at two quality points (calibrated on this
    # content: 2-of-5 layers ~= 0.03 bpp -> ~17 dB; all layers -> ~40 dB)
    results = {}
    for cl in (2, 5):
        out = extract.quality_truncate(vs, clayers=cl)
        out = extract.spatial_truncate(out, 2)
        out = extract.temporal_truncate(out, 1)
        data = out.to_bytes()
        assert len(data) < len(full) * 0.5, (cl, len(data), len(full))
        rec = api.expand(extract.VideoStream.from_bytes(data))
        # SS: dims / 4; TS: frame rate / 2 on a gop_size-2 stream
        assert rec.y.shape == (2, 1024, 1024), rec.y.shape
        results[cl] = (len(data), psnr(ref, rec.y))
    assert results[2][1] > 14.0, results
    assert results[5][1] > 34.0, results
    # quality axis: more layers = more bytes = higher PSNR
    assert results[2][0] < results[5][0]
    assert results[2][1] < results[5][1]


def test_axes_compose_monotonically(stream4k):
    """Each added axis only removes bytes, never grows the stream."""
    cfg, vid, vs = stream4k
    q = extract.quality_truncate(vs, clayers=2)
    qs_ = len(q.to_bytes())
    s = extract.spatial_truncate(q, 1)
    ss_ = len(s.to_bytes())
    t = extract.temporal_truncate(s, 1)
    ts_ = len(t.to_bytes())
    assert ts_ <= ss_ <= qs_ <= len(vs.to_bytes())


def test_info_on_extracted(stream4k):
    """info tables stay consistent on the jointly extracted stream."""
    cfg, vid, vs = stream4k
    out = extract.temporal_truncate(
        extract.spatial_truncate(extract.quality_truncate(vs, clayers=2), 1),
        1)
    si = info.stream_info(out, fps=30.0)
    assert si.total_bytes == sum(si.texture_bytes.values()) + \
        sum(si.motion_bytes.values())
    rows = si.gop_table()
    assert len(rows) == out.cfg.GOPs + 1
