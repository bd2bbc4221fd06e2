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
