"""Packed 2D DWT: bit-exactness vs the reference dwt2d.cpp golden vectors,
perfect reconstruction on awkward sizes, interpolation helpers."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from qsvc_tpu.ops import dwt2d

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "dwt2d_golden.npz"))


def _cases():
    seen = set()
    for key in GOLDEN.files:
        base = key.rsplit("_", 1)[0]
        if base not in seen:
            seen.add(base)
    return sorted(seen)


@pytest.mark.parametrize("base", _cases())
def test_bit_exact_vs_reference(base):
    orig = GOLDEN[base + "_orig"].astype(np.int32)
    ana_ref = GOLDEN[base + "_ana"].astype(np.int32)
    syn_ref = GOLDEN[base + "_syn"].astype(np.int32)
    levels = int(base.split("_l")[1])
    ana = dwt2d.analyze(jnp.asarray(orig), levels)
    np.testing.assert_array_equal(np.asarray(ana), ana_ref, err_msg=base)
    syn = dwt2d.synthesize(jnp.asarray(ana_ref), levels)
    np.testing.assert_array_equal(np.asarray(syn), syn_ref, err_msg=base)


@pytest.mark.parametrize("shape,levels", [
    ((8, 8), 1), ((16, 12), 2), ((17, 19), 3), ((33, 65), 3), ((5, 7), 2),
])
@pytest.mark.parametrize("filt", ["5/3", "haar"])
def test_perfect_reconstruction(shape, levels, filt, rng):
    x = jnp.asarray(rng.integers(-255, 256, size=shape, dtype=np.int32))
    ana = dwt2d.analyze(x, levels, filt)
    rec = dwt2d.synthesize(ana, levels, filt)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_batched_frames(rng):
    x = jnp.asarray(rng.integers(0, 256, size=(4, 24, 20), dtype=np.int32))
    ana = dwt2d.analyze(x, 2)
    rec = dwt2d.synthesize(ana, 2)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))
    one = dwt2d.analyze(x[2], 2)
    np.testing.assert_array_equal(np.asarray(ana[2]), np.asarray(one))


def test_upsample_downsample_roundtrip(rng):
    # downsample(upsample(x)) == x for the zero-high-band interpolation pair
    x = jnp.asarray(rng.integers(0, 256, size=(12, 16), dtype=np.int32))
    up = dwt2d.upsample2(x)
    assert up.shape == (24, 32)
    down = dwt2d.downsample2(up)
    np.testing.assert_array_equal(np.asarray(down), np.asarray(x))


def _upsample2_packed(x, filt="5/3"):
    H, W = x.shape[-2], x.shape[-1]
    canvas = jnp.zeros(x.shape[:-2] + (2 * H, 2 * W), dtype=x.dtype)
    canvas = canvas.at[..., :H, :W].set(x)
    return dwt2d.synthesize(canvas, 1, filt)


def _downsample2_packed(x, filt="5/3"):
    H, W = x.shape[-2], x.shape[-1]
    packed = dwt2d.analyze(x, 1, filt)
    return packed[..., :H - H // 2, :W - W // 2]


@pytest.mark.parametrize("shape", [(12, 16), (11, 16), (12, 15), (1, 1),
                                   (3, 128), (17, 19)])
def test_upsample2_closed_form_matches_packed(shape, rng):
    """The zero-high 5/3 synthesis closed form must be bit-identical to the
    generic packed path, including negative values (truncating division)."""
    x = jnp.asarray(rng.integers(-300, 300, size=shape, dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(dwt2d.upsample2(x)),
                                  np.asarray(_upsample2_packed(x)))


@pytest.mark.parametrize("shape", [(12, 16), (2, 2), (8, 128), (34, 62)])
def test_downsample2_closed_form_matches_packed(shape, rng):
    x = jnp.asarray(rng.integers(-300, 300, size=shape, dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(dwt2d.downsample2(x)),
                                  np.asarray(_downsample2_packed(x)))


def test_downsample2_odd_dims_fallback(rng):
    x = jnp.asarray(rng.integers(-300, 300, size=(11, 15), dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(dwt2d.downsample2(x)),
                                  np.asarray(_downsample2_packed(x)))


def test_resample_batched(rng):
    x = jnp.asarray(rng.integers(-300, 300, size=(3, 10, 14), dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(dwt2d.upsample2(x)),
                                  np.asarray(_upsample2_packed(x)))
    np.testing.assert_array_equal(np.asarray(dwt2d.downsample2(x)),
                                  np.asarray(_downsample2_packed(x)))


def test_ll_view(rng):
    x = jnp.asarray(rng.integers(0, 256, size=(32, 48), dtype=np.int32))
    ana = dwt2d.analyze(x, 2)
    assert dwt2d.ll_view(ana, 2).shape == (8, 12)
