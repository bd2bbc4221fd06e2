"""EBCOT Tier-1: lossless round-trip, truncated decode monotonicity,
distortion bookkeeping."""

import numpy as np
import pytest

from qsvc_tpu.codec import tier1


def _roundtrip(coeffs, band="LL", passes=None):
    cb = tier1.encode_codeblock(coeffs, band)
    n = cb.num_passes if passes is None else passes
    dec = tier1.decode_codeblock(cb.data, cb.msbs, n, cb.shape, band,
                                 cb.pass_ends)
    return cb, dec


@pytest.mark.parametrize("band", ["LL", "LH", "HL", "HH"])
@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (13, 9), (4, 4), (64, 17)])
def test_lossless_roundtrip(band, shape, rng):
    coeffs = rng.integers(-255, 256, shape).astype(np.int64)
    cb, dec = _roundtrip(coeffs, band)
    np.testing.assert_array_equal(dec, coeffs)


def test_sparse_block(rng):
    coeffs = np.zeros((32, 32), np.int64)
    coeffs[3, 7] = -100
    coeffs[20, 20] = 5
    cb, dec = _roundtrip(coeffs, "HH")
    np.testing.assert_array_equal(dec, coeffs)
    # sparse blocks should code compactly (run-length mode)
    assert len(cb.data) < 80, len(cb.data)


def test_zero_block():
    coeffs = np.zeros((16, 16), np.int64)
    cb, dec = _roundtrip(coeffs, "LL")
    assert cb.msbs == 0 and cb.data == b""
    np.testing.assert_array_equal(dec, coeffs)


def test_truncated_decode_improves_with_passes(rng):
    coeffs = (rng.normal(0, 60, (32, 32))).astype(np.int64)
    cb = tier1.encode_codeblock(coeffs, "LH")
    prev_mse = None
    for n in range(1, cb.num_passes + 1):
        dec = tier1.decode_codeblock(cb.data, cb.msbs, n, cb.shape, "LH",
                                     cb.pass_ends)
        mse = float(np.mean((dec - coeffs) ** 2))
        if prev_mse is not None:
            assert mse <= prev_mse + 1e-9, (n, mse, prev_mse)
        prev_mse = mse
    assert prev_mse == 0.0  # full decode lossless


def test_recorded_distortion_matches_actual(rng):
    coeffs = (rng.normal(0, 40, (16, 16))).astype(np.int64)
    cb = tier1.encode_codeblock(coeffs, "HL")
    for n in (1, 2, 3, cb.num_passes):
        if n > cb.num_passes:
            continue
        dec = tier1.decode_codeblock(cb.data, cb.msbs, n, cb.shape, "HL",
                                     cb.pass_ends)
        actual = float(np.sum((dec - coeffs).astype(np.float64) ** 2))
        recorded = cb.pass_dist[n - 1]
        assert actual == pytest.approx(recorded, rel=1e-9), (n, actual, recorded)


def test_pass_rates_monotone(rng):
    coeffs = (rng.normal(0, 60, (32, 32))).astype(np.int64)
    cb = tier1.encode_codeblock(coeffs, "LL")
    assert cb.pass_ends == sorted(cb.pass_ends)
    assert all(d0 >= d1 - 1e-9 for d0, d1 in
               zip([cb.dist0] + cb.pass_dist[:-1], cb.pass_dist))
