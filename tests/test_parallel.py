"""Distributed MCTF on a virtual 8-device CPU mesh: sharded results must
match the single-device sequential transform exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.mctf import transform
from qsvc_tpu.parallel import mesh as pmesh
from qsvc_tpu.parallel import transform as ptransform

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

NDEV = len(jax.devices())


@pytest.fixture(scope="module")
def setup():
    # tiny on purpose: XLA-CPU compiles of multi-device shard_maps take
    # minutes at any real size; 2 devices x TRLs=2 x search_range=2 covers
    # the same halo/collective paths (the driver's dryrun_multichip and the
    # real-TPU bench exercise the large shapes)
    G = min(NDEV, 2)
    cfg = CodecConfig(pixels_in_x=32, pixels_in_y=32, TRLs=2, GOPs=G,
                      block_size=16, search_range=2, update_factor=0.25,
                      quantization_texture=0, SRLs=3)
    vid = synthetic_video(cfg.pictures, 32, 32, seed=21)
    y = vid.y.astype(np.int32)
    u = vid.u.astype(np.int32)
    v = vid.v.astype(np.int32)
    return cfg, y, u, v


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
def test_shard_unshard_roundtrip(setup):
    cfg, y, u, v = setup
    g = pmesh.shard_gops(y, cfg.gop_size)
    assert g.shape == (cfg.GOPs, cfg.gop_size + 1, 32, 32)
    back = pmesh.unshard_gops(g)
    np.testing.assert_array_equal(back, y)


@pytest.mark.skipif(NDEV < 4, reason="needs >= 4 devices")
def test_distributed_matches_sequential_4dev():
    """4-GOP ring: with only 2 participants the left and right ppermute
    neighbours coincide, so this is the smallest mesh that can catch a
    wrong neighbour index in the halo exchange."""
    cfg = CodecConfig(pixels_in_x=32, pixels_in_y=32, TRLs=2, GOPs=4,
                      block_size=16, search_range=2, update_factor=0.25,
                      quantization_texture=0, SRLs=2)
    vid = synthetic_video(cfg.pictures, 32, 32, seed=3)
    y = vid.y.astype(np.int32)
    u = vid.u.astype(np.int32)
    v = vid.v.astype(np.int32)
    m = pmesh.make_mesh(cfg.GOPs)
    gy = pmesh.put_sharded(pmesh.shard_gops(y, cfg.gop_size), m)
    gu = pmesh.put_sharded(pmesh.shard_gops(u, cfg.gop_size), m)
    gv = pmesh.put_sharded(pmesh.shard_gops(v, cfg.gop_size), m)
    st = ptransform.analyze_sharded(jnp.asarray(gy), jnp.asarray(gu),
                                    jnp.asarray(gv), cfg, m)
    seq = transform.analyze(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                            cfg)
    got = np.asarray(st.levels[0].high_y).reshape(
        -1, *seq.levels[0].high_y.shape[1:])
    np.testing.assert_array_equal(got, np.asarray(seq.levels[0].high_y))
    low = pmesh.unshard_gops(np.asarray(st.low_y))
    np.testing.assert_array_equal(low, np.asarray(seq.low_y))
    ry, ru, rv = ptransform.synthesize_sharded(st, cfg, m)
    sy, su, sv = transform.synthesize(seq, cfg)
    np.testing.assert_array_equal(pmesh.unshard_gops(np.asarray(ry)),
                                  np.asarray(sy))


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
def test_distributed_matches_sequential(setup):
    cfg, y, u, v = setup
    m = pmesh.make_mesh(cfg.GOPs)
    gy = pmesh.put_sharded(pmesh.shard_gops(y, cfg.gop_size), m)
    gu = pmesh.put_sharded(pmesh.shard_gops(u, cfg.gop_size), m)
    gv = pmesh.put_sharded(pmesh.shard_gops(v, cfg.gop_size), m)

    st = ptransform.analyze_sharded(jnp.asarray(gy), jnp.asarray(gu),
                                    jnp.asarray(gv), cfg, m)

    # sequential reference over the whole sequence
    seq = transform.analyze(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                            cfg)

    # per-GOP high bands concatenated must equal the sequential high bands
    for t in range(len(seq.levels)):
        got = np.asarray(st.levels[t].high_y).reshape(
            -1, *seq.levels[t].high_y.shape[1:])
        np.testing.assert_array_equal(got, np.asarray(seq.levels[t].high_y),
                                      err_msg=f"level {t} high")
        gmv = np.asarray(st.levels[t].mv).reshape(
            -1, *seq.levels[t].mv.shape[1:])
        np.testing.assert_array_equal(gmv, np.asarray(seq.levels[t].mv))
    # low band: drop duplicated boundaries
    low = pmesh.unshard_gops(np.asarray(st.low_y))
    np.testing.assert_array_equal(low, np.asarray(seq.low_y))

    # distributed synthesis must agree exactly with sequential synthesis
    # (the update step itself is only near-invertible due to clamping, so
    # compare decoder-to-decoder, not to the input)
    sy, su, sv = transform.synthesize(seq, cfg)
    ry, ru, rv = ptransform.synthesize_sharded(st, cfg, m)
    np.testing.assert_array_equal(pmesh.unshard_gops(np.asarray(ry)),
                                  np.asarray(sy))
    np.testing.assert_array_equal(pmesh.unshard_gops(np.asarray(ru)),
                                  np.asarray(su))
    # and stay near-lossless vs the input
    err = np.abs(pmesh.unshard_gops(np.asarray(ry)).astype(int) - y)
    assert float(np.mean(err ** 2)) < 8.0, float(np.mean(err ** 2))


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
def test_encode_step_sharded_compiles(setup):
    cfg, y, u, v = setup
    m = pmesh.make_mesh(cfg.GOPs)
    gy = pmesh.put_sharded(pmesh.shard_gops(y, cfg.gop_size), m)
    gu = pmesh.put_sharded(pmesh.shard_gops(u, cfg.gop_size), m)
    gv = pmesh.put_sharded(pmesh.shard_gops(v, cfg.gop_size), m)
    out = ptransform.encode_step_sharded(jnp.asarray(gy), jnp.asarray(gu),
                                         jnp.asarray(gv), cfg, m)
    assert out["low"][0].shape[0] == cfg.GOPs
    assert len(out["levels"]) == cfg.TRLs - 1
