"""Bit-parallel ("bp") block coder: round trips, truncation semantics,
distortion bookkeeping, and full-pipeline integration.

The bp coder is the framework's throughput mode (uint64 row masks +
PEXT/PDEP, frozen-per-plane pass membership, raw SPP/MRP bits + stripe
group-tested cleanup).  It shares pass/slope/truncation semantics with the
spec-style MQ path, so every scalability feature must behave identically.
"""

import numpy as np
import pytest

from qsvc_tpu.codec import fast

pytestmark = pytest.mark.skipif(not fast.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("shape", [(64, 64), (13, 9), (4, 7), (64, 1)])
@pytest.mark.parametrize("scale", [2, 90, 2000])
def test_roundtrip(shape, scale, rng):
    t = rng.normal(0, scale, shape).astype(np.int64)
    cb = fast._bp_encode_tiles([t])[0]
    dec = fast.bp_decode_tiles([(cb.data, cb.msbs, cb.num_passes,
                                 cb.shape)])[0]
    np.testing.assert_array_equal(dec, t)


def test_truncation_monotone_and_distortion_exact(rng):
    t = rng.normal(0, 120, (64, 64)).astype(np.int64)
    cb = fast._bp_encode_tiles([t])[0]
    prev = None
    for n in range(1, cb.num_passes + 1):
        d = fast.bp_decode_tiles([(cb.data[:cb.pass_ends[n - 1]], cb.msbs,
                                   n, cb.shape)])[0]
        sse = float(((d - t) ** 2).sum())
        # recorded distortion must match the actual decode SSE exactly
        assert sse == pytest.approx(cb.pass_dist[n - 1], rel=1e-9)
        if prev is not None:
            assert sse <= prev + 1e-9
        prev = sse


def test_compaction_close_to_mq(rng):
    """bp trades compaction for speed; the gap must stay modest."""
    t = (rng.normal(0, 15, (64, 64))).astype(np.int64)
    mq = fast.encode_codeblock(t, "LH")
    bp = fast._bp_encode_tiles([t])[0]
    assert len(bp.data) < 1.35 * len(mq.data), (len(bp.data), len(mq.data))


def test_packed_planes_roundtrip(rng):
    planes = rng.normal(0, 9, (3, 80, 112)).astype(np.int16)
    tiles, bands = [], []
    for n in range(3):
        for y in range(0, 80, 64):
            for x in range(0, 112, 64):
                tiles.append((n, y, x, min(64, 80 - y), min(64, 112 - x)))
                bands.append("HL")
    enc = fast.encode_packed_planes(planes, tiles, bands, coder="bp")
    blocks = [(c.data, c.msbs, c.num_passes, c.shape, b, c.pass_ends)
              for c, b in zip(enc, bands)]
    out = np.zeros(planes.shape, np.int32)
    fast.decode_packed_planes(blocks, [(m[0], m[1], m[2]) for m in tiles],
                              out, coder="bp")
    np.testing.assert_array_equal(out, planes.astype(np.int32))


def test_pipeline_lossless_bp(rng):
    from qsvc_tpu.api import compress, expand
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=1, GOPs=1,
                      SRLs=3, quantization_texture=0, texture_coder="bp")
    vid = synthetic_video(1, 48, 64, seed=5)
    vs = compress(vid, cfg, reversible=True)
    assert vs.low[0]["y"].coder == "bp"
    out = expand(vs)
    np.testing.assert_array_equal(out.y, vid.y)
    np.testing.assert_array_equal(out.u, vid.u)
    np.testing.assert_array_equal(out.v, vid.v)


def test_pipeline_lossy_bp_serialized(rng):
    from qsvc_tpu.api import compress, expand
    from qsvc_tpu.codec.codestream import VideoStream
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video, video_psnr
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=2, GOPs=1,
                      block_size=16, SRLs=3, quantization_texture=44000,
                      texture_coder="bp")
    vid = synthetic_video(cfg.pictures, 48, 64, seed=6)
    vs = compress(vid, cfg, reversible=False)
    data = vs.to_bytes()
    out = expand(VideoStream.from_bytes(data))
    py, _, _ = video_psnr(vid, out)
    assert py > 30.0, py
