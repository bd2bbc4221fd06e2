"""Pallas MC kernels vs the lax reference formulations (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from qsvc_tpu.mctf import predict, update
from qsvc_tpu.ops import pallas_mc


BS = 16
FX = pallas_mc._fx(BS)
H, W = 64, 256
BY, BX = H // BS, W // BS
P = 2
SR = 4


def _pad_edge(x, bs, fx):
    return np.pad(x, [(0, 0), (0, 0), (bs, bs), (fx * bs, fx * bs)],
                  mode="edge")


def _pad_zero(x, bs, fx):
    return np.pad(x, [(0, 0), (0, 0), (bs, bs), (fx * bs, fx * bs)])


def test_supported():
    assert pallas_mc.supported(H, W, BS, SR)
    assert pallas_mc.supported(1088, 1920, 64, 32)
    assert not pallas_mc.supported(288, 352, 32, 4)      # W % 128 != 0
    assert not pallas_mc.supported(1088, 1920, 64, 128)  # mv beyond block


def test_predict_pallas_matches_lax(rng):
    refs_p = rng.integers(0, 256, (P, 3, H, W)).astype(np.int16)
    refs_n = rng.integers(0, 256, (P, 3, H, W)).astype(np.int16)
    mv = rng.integers(-SR, SR + 1, (P, 2, 2, BY, BX)).astype(np.int32)
    want = jax.vmap(lambda a, b, m: predict.predict_frame(
        a, b, m, BS, 4 * SR))(jnp.asarray(refs_p), jnp.asarray(refs_n),
                              jnp.asarray(mv))
    with pltpu.force_tpu_interpret_mode():
        got = pallas_mc.predict_pallas(
            jnp.asarray(_pad_edge(refs_p, BS, FX)),
            jnp.asarray(_pad_edge(refs_n, BS, FX)), jnp.asarray(mv), BS)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_update_pallas_matches_lax(rng):
    res = rng.integers(-128, 128, (P, 3, H, W)).astype(np.int16)
    mv = rng.integers(-SR, SR + 1, (P, 2, BY, BX)).astype(np.int32)
    contrib = np.floor(res.astype(np.float32) * 0.25).astype(np.int16)
    want = jax.vmap(lambda r, my, mx: update._update_field(
        r, my, mx, BS, 0.25, SR))(jnp.asarray(res),
                                  jnp.asarray(mv[:, 0]),
                                  jnp.asarray(mv[:, 1]))
    mvp = np.pad(mv, [(0, 0), (0, 0), (1, 1), (1, 1)])
    with pltpu.force_tpu_interpret_mode():
        got = pallas_mc.update_pallas(
            jnp.asarray(_pad_zero(contrib, BS, FX)),
            jnp.asarray(mvp[:, 0]), jnp.asarray(mvp[:, 1]), BS)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_update_pallas_extreme_vectors(rng):
    """|mv| == block_size boundary case at the frame corners."""
    bs, fx = 16, pallas_mc._fx(16)
    h, w = 32, 128
    by, bx = h // bs, w // bs
    res = rng.integers(-128, 128, (1, 1, h, w)).astype(np.int16)
    mv = np.where(rng.random((1, 2, by, bx)) < 0.5, -bs, bs).astype(np.int32)
    contrib = np.floor(res.astype(np.float32) * 0.25).astype(np.int16)
    want = jax.vmap(lambda r, my, mx: update._update_field(
        r, my, mx, bs, 0.25, bs))(jnp.asarray(res),
                                  jnp.asarray(mv[:, 0]),
                                  jnp.asarray(mv[:, 1]))
    mvp = np.pad(mv, [(0, 0), (0, 0), (1, 1), (1, 1)])
    with pltpu.force_tpu_interpret_mode():
        got = pallas_mc.update_pallas(
            jnp.asarray(_pad_zero(contrib, bs, fx)),
            jnp.asarray(mvp[:, 0]), jnp.asarray(mvp[:, 1]), bs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_update2_pallas_matches_two_directions(rng):
    """The fused both-directions kernel must equal two one-direction lax
    updates bit-exactly (including the |mv| == bs boundary)."""
    res = rng.integers(-128, 128, (P, 3, H, W)).astype(np.int16)
    mv = rng.integers(-BS, BS + 1, (P, 2, 2, BY, BX)).astype(np.int32)
    want = [jax.vmap(lambda r, my, mx: update._update_field(
        r, my, mx, BS, 0.25, BS))(jnp.asarray(res),
                                  jnp.asarray(mv[:, d, 0]),
                                  jnp.asarray(mv[:, d, 1]))
            for d in range(2)]
    contrib = np.floor(res.astype(np.float32) * 0.25).astype(np.int16)
    mvp = np.pad(mv, [(0, 0), (0, 0), (0, 0), (1, 1), (1, 1)])
    with pltpu.force_tpu_interpret_mode():
        got = pallas_mc.update2_pallas(
            jnp.asarray(_pad_zero(contrib, BS, FX)), jnp.asarray(mvp), BS)
    np.testing.assert_array_equal(np.asarray(got[:, 0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[:, 1]), np.asarray(want[1]))


def test_update_fields_batch2_matches_single(rng):
    """update_fields_batch2 (whatever backend path) == two
    update_fields_batch calls."""
    res = rng.integers(-128, 128, (P, 3, H, W)).astype(np.int16)
    mv = rng.integers(-SR, SR + 1, (P, 2, 2, BY, BX)).astype(np.int32)
    up, un = update.update_fields_batch2(jnp.asarray(res), jnp.asarray(mv),
                                         BS, 0.25, SR)
    wp = update.update_fields_batch(jnp.asarray(res), jnp.asarray(mv[:, 0, 0]),
                                    jnp.asarray(mv[:, 0, 1]), BS, 0.25, SR)
    wn = update.update_fields_batch(jnp.asarray(res), jnp.asarray(mv[:, 1, 0]),
                                    jnp.asarray(mv[:, 1, 1]), BS, 0.25, SR)
    np.testing.assert_array_equal(np.asarray(up), np.asarray(wp))
    np.testing.assert_array_equal(np.asarray(un), np.asarray(wn))
