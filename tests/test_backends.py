"""Alternative texture-codec backends (codec/backends.py): the
reference's codec-registry capability (mcj2k/mcmj2k/mccp profiles,
texture_compress.py:39, SURVEY §2.2 'alternative codec backends')."""

import numpy as np
import pytest

from qsvc_tpu import api
from qsvc_tpu.codec import backends
from qsvc_tpu.codec.codestream import VideoStream
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.io.yuv import video_psnr
from qsvc_tpu.scal import extract


def _cfg(**kw):
    base = dict(pixels_in_x=64, pixels_in_y=48, TRLs=3, GOPs=1,
                block_size=16, search_range=2, SRLs=3,
                update_factor=0.0, quantization_texture=45000)
    base.update(kw)
    return CodecConfig(**base)


@pytest.fixture(scope="module")
def vid():
    return synthetic_video(5, 48, 64, seed=7, kind="translate",
                           velocity=(1.0, 1.0))


@pytest.mark.parametrize("name", ["cp", "zlib"])
def test_lossless_backend_roundtrip(vid, name):
    cfg = _cfg(texture_backend=name)
    vs = api.compress(vid, cfg)
    data = vs.to_bytes()
    rec = api.expand(VideoStream.from_bytes(data))
    # update_factor=0 + lossless backend -> bit-exact through MCTF
    np.testing.assert_array_equal(rec.y, vid.y)
    np.testing.assert_array_equal(rec.u, vid.u)
    np.testing.assert_array_equal(rec.v, vid.v)


def test_zlib_smaller_than_cp(vid):
    n_cp = len(api.compress(vid, _cfg(texture_backend="cp")).to_bytes())
    n_z = len(api.compress(vid, _cfg(texture_backend="zlib")).to_bytes())
    assert n_z < n_cp


@pytest.mark.skipif("j2k" not in backends.available(),
                    reason="Pillow built without OpenJPEG")
def test_j2k_backend_lossless(vid):
    cfg = _cfg(texture_backend="j2k")
    vs = api.compress(vid, cfg)
    rec = api.expand(VideoStream.from_bytes(vs.to_bytes()))
    np.testing.assert_array_equal(rec.y, vid.y)
    # every texture payload is a standard .j2c code-stream
    assert vs.low[0]["y"].payload[:2] == b"\xFF\x4F"


@pytest.mark.skipif("mj2k" not in backends.available(),
                    reason="Pillow built without OpenJPEG")
def test_mj2k_backend_lossy_quality(vid):
    cfg = _cfg(texture_backend="mj2k", quantization_texture=44000)
    vs = api.compress(vid, cfg)
    data = vs.to_bytes()
    rec = api.expand(VideoStream.from_bytes(data))
    raw = vid.y.size * 3 // 2
    assert len(data) < raw                       # actually compresses
    assert video_psnr(vid, rec)[0] > 30


def test_backend_ts_extraction_works(vid):
    """TS extraction drops whole temporal levels — codec-agnostic, so it
    must work on backend streams (QS/SS are internal-codec features)."""
    cfg = _cfg(texture_backend="zlib")
    vs = api.compress(vid, cfg)
    ts = extract.temporal_truncate(vs, 1)
    rec = api.expand(VideoStream.from_bytes(ts.to_bytes()))
    assert rec.frames == cfg.gop_size // 2 + 1
    np.testing.assert_array_equal(rec.y, vid.y[::2])


def test_backend_ss_extraction_rejected(vid):
    cfg = _cfg(texture_backend="zlib")
    vs = api.compress(vid, cfg)
    with pytest.raises(ValueError, match="internal texture codec"):
        extract.spatial_truncate(vs, 1)


def test_unknown_backend_message():
    with pytest.raises(KeyError, match="available"):
        backends.get("kakadu")


def test_backend_streaming_gops(vid4=None):
    """compress_gops + expand_gops with a backend (host path, no device
    pipeline) still yields the per-GOP container semantics."""
    vid = synthetic_video(9, 48, 64, seed=8, kind="translate",
                          velocity=(1.0, 1.0))
    cfg = _cfg(GOPs=2, texture_backend="zlib")
    streams = api.compress_gops(vid, cfg)
    assert len(streams) == 2
    rec = api.expand_gops(streams)
    np.testing.assert_array_equal(rec.y, vid.y)


def test_backend_header_metadata(vid):
    """Stream headers must reflect the backend's nature: lossless
    backends mark reversible=True; the lossy mj2k backend must NOT
    misreport its stream as reversible (info/expand read this field)."""
    vs = api.compress(vid, _cfg(texture_backend="cp"))
    assert vs.reversible
    if "mj2k" in backends.available():
        vs = api.compress(vid, _cfg(texture_backend="mj2k",
                                    quantization_texture=44000))
        assert not vs.reversible
        assert vs.delta == 0.0


@pytest.mark.skipif("mjpeg" not in backends.available(),
                    reason="Pillow built without JPEG")
def test_mjpeg_backend_lossy_quality(vid):
    cfg = _cfg(texture_backend="mjpeg", quantization_texture=43000)
    vs = api.compress(vid, cfg)
    data = vs.to_bytes()
    rec = api.expand(VideoStream.from_bytes(data))
    assert not vs.reversible
    assert len(data) < vid.y.size * 3 // 2
    assert video_psnr(vid, rec)[0] > 28
    # every texture payload is a standard JFIF stream
    assert vs.low[0]["y"].payload[:2] == b"\xff\xd8"


def test_ltw_backend_roundtrip_and_rate(vid):
    lo = api.compress(vid, _cfg(texture_backend="ltw",
                                quantization_texture=44000)).to_bytes()
    hi = api.compress(vid, _cfg(texture_backend="ltw",
                                quantization_texture=45500)).to_bytes()
    assert len(hi) < len(lo)            # higher slope -> fewer bytes
    rec = api.expand(VideoStream.from_bytes(lo))
    assert video_psnr(vid, rec)[0] > 30
