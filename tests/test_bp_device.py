"""Device bp-coder R-D simulation vs the native bp coder's own records."""

import numpy as np
import pytest

import jax.numpy as jnp

from qsvc_tpu.codec import bp_device, fast


def _native_smax(tile: np.ndarray) -> float:
    """Max prefix slope from the native coder's recorded pass accounting."""
    cs = fast._bp_encode_tiles([tile.astype(np.int64)])[0]
    if not cs.pass_ends:
        return 0.0
    best = 0.0
    for end, d in zip(cs.pass_ends, cs.pass_dist):
        if end > 0:
            best = max(best, (cs.dist0 - d) / end)
    return best


@pytest.mark.skipif(not fast.available(), reason="native library not built")
def test_bp_max_slope_matches_native(rng):
    tiles = []
    # mixed content: sparse, dense, tiny magnitudes, large magnitudes,
    # all-zero, single coefficient, negative-heavy
    tiles.append(np.zeros((64, 64), np.int32))
    t = np.zeros((64, 64), np.int32)
    t[5, 7] = -3000
    tiles.append(t)
    tiles.append(rng.integers(-3, 4, (64, 64)).astype(np.int32))
    tiles.append(rng.integers(-2000, 2000, (64, 64)).astype(np.int32))
    tiles.append((rng.normal(0, 30, (64, 64)) *
                  (rng.random((64, 64)) < 0.05)).astype(np.int32))
    tiles.append(np.full((64, 64), -32768, np.int32))

    stack = jnp.asarray(np.stack(tiles).astype(np.int16))
    th = jnp.full((len(tiles),), 64, jnp.int32)
    tw = jnp.full((len(tiles),), 64, jnp.int32)
    smax, d0 = bp_device.bp_max_slope(stack, th, tw)
    smax = np.asarray(smax)
    d0 = np.asarray(d0)
    for i, t in enumerate(tiles):
        want = _native_smax(t)
        assert smax[i] == pytest.approx(want, rel=1e-4, abs=1e-6), i
        assert d0[i] == pytest.approx(float((t.astype(np.float64) ** 2)
                                            .sum()), rel=1e-5)


@pytest.mark.skipif(not fast.available(), reason="native library not built")
def test_bp_max_slope_edge_tiles(rng):
    """Edge tiles (th/tw < cb) must match the native coder run on the
    un-padded tile — padded area stays outside every pass."""
    for (th_, tw_) in [(64, 17), (5, 64), (9, 13), (1, 1)]:
        tile = rng.integers(-500, 500, (th_, tw_)).astype(np.int32)
        padded = np.zeros((64, 64), np.int32)
        padded[:th_, :tw_] = tile
        smax, _ = bp_device.bp_max_slope(
            jnp.asarray(padded[None].astype(np.int16)),
            jnp.asarray([th_], jnp.int32), jnp.asarray([tw_], jnp.int32))
        want = _native_smax(tile)
        assert float(smax[0]) == pytest.approx(want, rel=1e-4, abs=1e-6), \
            (th_, tw_)


@pytest.mark.skipif(not fast.available(), reason="native library not built")
def test_keep_decision_exactness(rng):
    """The selection predicate (smax * w >= t) agrees with what survives
    hull truncation of the native coder's output."""
    from qsvc_tpu.codec.frame_codec import _hull_slopes
    tiles = [(rng.normal(0, s, (64, 64)) *
              (rng.random((64, 64)) < dens)).astype(np.int32)
             for s in (2, 8, 40, 300) for dens in (0.01, 0.3, 1.0)]
    stack = jnp.asarray(np.stack(tiles).astype(np.int16))
    n = len(tiles)
    smax = np.asarray(bp_device.bp_max_slope(
        stack, jnp.full((n,), 64, jnp.int32),
        jnp.full((n,), 64, jnp.int32))[0])
    w = 1.0
    for i, t in enumerate(tiles):
        cs = fast._bp_encode_tiles([t.astype(np.int64)])[0]
        slopes = _hull_slopes(cs.pass_ends, cs.pass_dist, cs.dist0, w)
        first = slopes[0] if slopes else 0.0
        # first hull slope == max prefix slope
        assert first == pytest.approx(float(smax[i]) * w, rel=1e-4,
                                      abs=1e-6), i
