"""Standard-J2K interop: streams from codec/j2k.py decoded by OpenJPEG.

This is the external conformance evidence for the whole entropy stack
(SURVEY §7.3d): MQ coder (including the guarded per-pass flush,
mq.py:flush), EBCOT Tier-1 contexts/passes, and the Tier-2 packet
grammar (tag trees, pass counts, Lblock lengths, bit-stuffing) — a
third-party decoder (OpenJPEG via Pillow) must reproduce every pixel of
a lossless stream.
"""

import io

import numpy as np
import pytest

from qsvc_tpu.codec import j2k

PIL = pytest.importorskip("PIL.Image")
from PIL import features  # noqa: E402

pytestmark = pytest.mark.skipif(
    not features.check("jpg_2000"),
    reason="Pillow built without OpenJPEG")


def _decode(data: bytes) -> np.ndarray:
    return np.array(PIL.open(io.BytesIO(data)))


def _roundtrip(img: np.ndarray, levels: int, cb: int) -> None:
    data = j2k.encode_j2c(img, levels=levels, cb=cb)
    dec = _decode(data)
    np.testing.assert_array_equal(dec, img)


def test_own_53_perfect_reconstruction(rng):
    for (h, w) in [(64, 96), (33, 47), (1, 7), (5, 1), (17, 128)]:
        x = rng.integers(0, 256, (h, w)).astype(np.int32) - 128
        for lv in (1, 2, 3):
            p = j2k.fwd_dwt53(x, lv)
            np.testing.assert_array_equal(j2k.inv_dwt53(p, lv), x)


@pytest.mark.parametrize("levels", [0, 1, 2, 3])
def test_lossless_random(rng, levels):
    img = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    _roundtrip(img, levels, 32)


def test_lossless_odd_dims(rng):
    img = rng.integers(0, 256, (67, 93)).astype(np.uint8)
    _roundtrip(img, 3, 32)


def test_lossless_smooth_content():
    yy, xx = np.mgrid[0:96, 0:128]
    img = (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)
           ).astype(np.uint8)
    _roundtrip(img, 3, 64)


def test_lossless_extremes():
    img = np.zeros((40, 56), np.uint8)
    _roundtrip(img, 2, 32)
    img[:] = 255
    _roundtrip(img, 2, 32)
    img[::2] = 0
    _roundtrip(img, 2, 32)


def test_lossless_many_codeblocks(rng):
    """Multiple code-blocks per band exercises the tag trees."""
    img = rng.integers(0, 256, (128, 160)).astype(np.uint8)
    _roundtrip(img, 2, 32)


def test_lossless_codec_subband_frame():
    """A real MCTF residue frame (biased uint8) from the pipeline
    survives the external decoder too."""
    from qsvc_tpu import api
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video
    from qsvc_tpu.mctf import transform
    import jax.numpy as jnp
    cfg = CodecConfig(pixels_in_x=64, pixels_in_y=48, TRLs=2, GOPs=1,
                      SRLs=3, block_size=16, search_range=2)
    vid = synthetic_video(cfg.pictures, cfg.pixels_in_y, cfg.pixels_in_x,
                          seed=12)
    st = transform.analyze_jit(jnp.asarray(vid.y), jnp.asarray(vid.u),
                               jnp.asarray(vid.v), cfg)
    high = np.asarray(st.levels[0].high_y[0]).astype(np.uint8)
    _roundtrip(high, 2, 32)


# ---------------------------------------------------------------- lossy

def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def smooth_noisy():
    rng_ = np.random.default_rng(0)
    yy, xx = np.mgrid[0:96, 0:128]
    return np.clip(128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)
                   + rng_.normal(0, 3, (96, 128)), 0, 255).astype(np.uint8)


def test_lossy_97_psnr_tracks_delta(smooth_noisy):
    """OpenJPEG must decode our irreversible 9/7 + QCD streams; finer
    base_delta -> monotonically better PSNR and bigger streams (the
    Kakadu Creversible=no role, texture_compress_fb_j2k.py:186)."""
    img = smooth_noisy
    prev_psnr, prev_len = 0.0, 0
    for bd in (4.0, 1.0, 0.25):
        data = j2k.encode_j2c(img, levels=3, cb=32, reversible=False,
                              base_delta=bd)
        dec = _decode(data)
        p = _psnr(img, dec)
        assert p > prev_psnr and len(data) > prev_len
        prev_psnr, prev_len = p, len(data)
    assert prev_psnr > 55        # delta=0.25 must be visually lossless


def test_lossy_97_matches_internal_reconstruction(smooth_noisy):
    """The external decode must agree with OUR dequantize + inverse 9/7
    (midpoint reconstruction) — pins the QCD step semantics, not just
    'looks fine'."""
    img = smooth_noisy
    bd = 0.5
    data = j2k.encode_j2c(img, levels=3, cb=32, reversible=False,
                          base_delta=bd)
    dec = _decode(data).astype(np.float64)

    levels = 3
    coefs = j2k.fwd_dwt97(img.astype(np.float64) - 128.0, levels)
    recon = np.zeros_like(coefs)
    for r, bands in enumerate(j2k._band_rects(*img.shape, levels)):
        for (band, y0, x0, bh, bw_) in bands:
            if bh <= 0 or bw_ <= 0:
                continue
            _eps, _mu, rep = j2k._qcd_step(
                bd, 8 + j2k._BAND_GAIN_LOG2[band])
            c = coefs[y0:y0 + bh, x0:x0 + bw_]
            q = np.sign(c) * np.floor(np.abs(c) / rep)
            recon[y0:y0 + bh, x0:x0 + bw_] = (
                np.sign(q) * (np.abs(q) + 0.5) * rep * (q != 0))
    expect = np.clip(np.round(j2k.inv_dwt97(recon, levels) + 128.0),
                     0, 255)
    # r=0.5 midpoint reconstruction is what OpenJPEG applies; allow 1 gray
    # level of slack for its float32 arithmetic
    assert np.abs(dec - expect).max() <= 1.0
    assert _psnr(expect.astype(np.uint8), dec.astype(np.uint8)) > 50


def test_lossy_layered_prefix_semantics(smooth_noisy):
    """2-layer stream: OpenJPEG decodes it; its layer-0 content equals a
    single-layer encode truncated at the coarse slope (so a decoder that
    stops after layer 0 sees exactly that quality point), and the full
    2-layer decode beats the coarse point."""
    img = smooth_noisy
    coarse, fine = 46500.0, 44000.0
    d2 = j2k.encode_j2c(img, levels=3, cb=32, reversible=False,
                        base_delta=0.125, layer_slopes=[coarse, fine])
    d1 = j2k.encode_j2c(img, levels=3, cb=32, reversible=False,
                        base_delta=0.125, layer_slopes=[coarse])
    p2 = _psnr(img, _decode(d2))
    p1 = _psnr(img, _decode(d1))
    assert len(d1) < len(d2)
    assert p1 + 1.0 < p2, (p1, p2)
    # the 2-layer stream must reach the same quality as an unlayered
    # encode truncated at the same final slope
    dref = j2k.encode_j2c(img, levels=3, cb=32, reversible=False,
                          base_delta=0.125, layer_slopes=[fine])
    assert abs(_psnr(img, _decode(dref)) - p2) < 0.3


def test_lossless_layered_still_bitexact(smooth_noisy):
    """Layering must not break reversibility: a 2-layer lossless stream
    (second layer keeps everything) still round-trips bit-exactly."""
    img = smooth_noisy
    data = j2k.encode_j2c(img, levels=3, cb=32,
                          layer_slopes=[45500.0, 0.0])
    np.testing.assert_array_equal(_decode(data), img)
