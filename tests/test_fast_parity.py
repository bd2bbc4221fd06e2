"""Native (C++) EBCOT fast path: bit-exact parity with the Python
reference implementation, batch APIs, and throughput sanity."""

import numpy as np
import pytest

from qsvc_tpu.codec import fast, tier1

pytestmark = pytest.mark.skipif(not fast.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("band", ["LL", "LH", "HL", "HH"])
@pytest.mark.parametrize("shape,scale", [((16, 16), 120), ((13, 9), 500),
                                         ((64, 64), 40), ((4, 7), 3)])
def test_encode_parity(band, shape, scale, rng):
    coeffs = rng.normal(0, scale, shape).astype(np.int64)
    py = tier1.encode_codeblock(coeffs, band)
    cc = fast.encode_codeblock(coeffs, band)
    assert cc.msbs == py.msbs
    assert cc.pass_ends == py.pass_ends
    assert cc.data == py.data
    # native tracks distortion incrementally (per coding event); float
    # summation order differs from the Python rescan, so allow rounding
    np.testing.assert_allclose(cc.pass_dist, py.pass_dist, rtol=1e-9,
                               atol=1e-6)
    assert cc.dist0 == pytest.approx(py.dist0)


@pytest.mark.parametrize("band", ["LH", "HH"])
def test_decode_parity_with_truncation(band, rng):
    coeffs = rng.normal(0, 200, (32, 32)).astype(np.int64)
    cb = tier1.encode_codeblock(coeffs, band)
    for n in (1, 2, 4, 7, cb.num_passes):
        if n > cb.num_passes:
            continue
        py = tier1.decode_codeblock(cb.data, cb.msbs, n, cb.shape, band,
                                    cb.pass_ends)
        cc = fast.decode_codeblock(cb.data, cb.msbs, n, cb.shape, band,
                                   cb.pass_ends)
        np.testing.assert_array_equal(cc, py, err_msg=f"passes={n}")


def test_roundtrip_native_only(rng):
    coeffs = rng.integers(-1000, 1000, (64, 64)).astype(np.int64)
    cb = fast.encode_codeblock(coeffs, "HL")
    dec = fast.decode_codeblock(cb.data, cb.msbs, cb.num_passes, cb.shape,
                                "HL", cb.pass_ends)
    np.testing.assert_array_equal(dec, coeffs)


def test_batch_matches_single(rng):
    tiles = [rng.normal(0, 100, (16, 16)).astype(np.int64) for _ in range(8)]
    bands = ["LL", "LH", "HL", "HH"] * 2
    batch = fast.encode_codeblocks_batch(tiles, bands)
    for t, b, cb in zip(tiles, bands, batch):
        single = fast.encode_codeblock(t, b)
        assert cb.data == single.data and cb.pass_ends == single.pass_ends
    dec = fast.decode_codeblocks_batch(
        [(cb.data, cb.msbs, cb.num_passes, cb.shape, b, cb.pass_ends)
         for cb, b in zip(batch, bands)])
    for t, d in zip(tiles, dec):
        np.testing.assert_array_equal(d, t)


def test_throughput_sane(rng):
    import time
    tiles = [rng.normal(0, 100, (64, 64)).astype(np.int64)
             for _ in range(32)]
    bands = ["LH"] * 32
    t0 = time.time()
    fast.encode_codeblocks_batch(tiles, bands)
    dt = time.time() - t0
    mbps = 32 * 64 * 64 / dt / 1e6
    # native path should sustain well over 1 Mcoeff/s (Python is ~0.01)
    assert mbps > 1.0, mbps
