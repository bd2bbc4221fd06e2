"""Pallas ME spiral-SAD kernel vs the lax reference formulation
(interpret mode — the real-TPU lowering is exercised by the bench and
driver entry; both paths share the exact spiral order / tie rule)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from qsvc_tpu.mctf import me
from qsvc_tpu.ops import pallas_me

BS = 32
FX = pallas_me._fx(BS)
H, W = 64, 128
BY, BX = H // BS, W // BS
P = 2
SR = 4


def _pad(x, ny, nx, by, bxp):
    act = x[:, :ny, :nx].astype(np.int32)
    return np.pad(act, ((0, 0), (BS, by * BS + BS - ny),
                        (FX * BS, bxp * BS + FX * BS - nx)), mode="edge")


def test_supported():
    assert pallas_me.supported(32, 0, 4)
    assert pallas_me.supported(64, 0, 63)
    assert not pallas_me.supported(64, 1, 4)    # border unsupported
    assert not pallas_me.supported(64, 0, 64)   # mv reach beyond block
    assert not pallas_me.supported(16, 0, 4)    # 4*bs % 128 != 0


@pytest.mark.parametrize("seed", [0, 1])
def test_refine_matches_lax(seed):
    rng = np.random.default_rng(seed)
    pred = rng.integers(0, 256, (P, H, W)).astype(np.int32)
    prev = rng.integers(0, 256, (P, H, W)).astype(np.int32)
    nxt = rng.integers(0, 256, (P, H, W)).astype(np.int32)
    mv = rng.integers(-SR, SR + 1, (P, 2, 2, BY, BX)).astype(np.int32)

    want = jax.vmap(lambda a, b, c, m: me._refine_level(
        a, b, c, m, BS, 0, H, W, SR))(
        jnp.asarray(pred), jnp.asarray(prev), jnp.asarray(nxt),
        jnp.asarray(mv))

    with pltpu.force_tpu_interpret_mode():
        d = pallas_me.refine_pallas(
            jnp.asarray(_pad(pred, H, W, BY, BX)),
            jnp.asarray(_pad(prev, H, W, BY, BX)),
            jnp.asarray(_pad(nxt, H, W, BY, BX)),
            jnp.asarray(mv), BS)[..., :BX]
    upd = np.stack([np.stack([d[:, 0], d[:, 1]], axis=1),
                    np.stack([d[:, 2], d[:, 3]], axis=1)], axis=1)
    np.testing.assert_array_equal(mv + upd, np.asarray(want))


def test_refine_odd_active_region():
    """Active region smaller than the block grid (pyramid levels whose
    dims are not block multiples): clamped reads must match the lax
    path's edge-replicated patches."""
    rng = np.random.default_rng(3)
    ny, nx = H - 10, W - 20
    pred = rng.integers(0, 256, (P, ny, nx)).astype(np.int32)
    prev = rng.integers(0, 256, (P, ny, nx)).astype(np.int32)
    nxt = rng.integers(0, 256, (P, ny, nx)).astype(np.int32)
    mv = rng.integers(-SR, SR + 1, (P, 2, 2, BY, BX)).astype(np.int32)

    want = jax.vmap(lambda a, b, c, m: me._refine_level(
        a, b, c, m, BS, 0, ny, nx, SR))(
        jnp.asarray(pred), jnp.asarray(prev), jnp.asarray(nxt),
        jnp.asarray(mv))

    with pltpu.force_tpu_interpret_mode():
        d = pallas_me.refine_pallas(
            jnp.asarray(_pad(pred, ny, nx, BY, BX)),
            jnp.asarray(_pad(prev, ny, nx, BY, BX)),
            jnp.asarray(_pad(nxt, ny, nx, BY, BX)),
            jnp.asarray(mv), BS)[..., :BX]
    upd = np.stack([np.stack([d[:, 0], d[:, 1]], axis=1),
                    np.stack([d[:, 2], d[:, 3]], axis=1)], axis=1)
    np.testing.assert_array_equal(mv + upd, np.asarray(want))
