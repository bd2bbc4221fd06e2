"""Frame texture codec: lossless round-trip, lossy quality, slope
truncation monotonicity, reduced-resolution (SS) decode."""

import numpy as np
import pytest

from qsvc_tpu.codec import frame_codec
from qsvc_tpu.io import synthetic_video


def _test_plane(h=64, w=80, seed=0):
    vid = synthetic_video(1, h, w, seed=seed)
    return vid.y[0].astype(np.int32)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_lossless_roundtrip():
    plane = _test_plane()
    ef = frame_codec.encode_frame(plane, levels=3, reversible=True)
    rec = frame_codec.decode_frame(ef)
    np.testing.assert_array_equal(rec, plane)


def test_lossless_compresses():
    plane = _test_plane()
    ef = frame_codec.encode_frame(plane, levels=3, reversible=True)
    assert ef.total_bytes < plane.size          # < 8 bpp

def test_lossy_97_high_quality():
    plane = _test_plane()
    ef = frame_codec.encode_frame(plane, levels=3, reversible=False,
                                  delta=0.125)
    rec = frame_codec.decode_frame(ef)
    assert _psnr(rec, plane) > 45, _psnr(rec, plane)


def test_truncation_monotone_rd():
    plane = _test_plane()
    ef = frame_codec.encode_frame(plane, levels=3, reversible=False,
                                  delta=0.125)
    prev_bytes = None
    prev_psnr = None
    results = []
    for u in (47000, 45000, 43500, 42000, 0):
        thr = frame_codec.slope_to_threshold(u) if u else 0.0
        t = ef.truncate(thr) if thr else ef
        rec = frame_codec.decode_frame(t)
        results.append((u, t.total_bytes, _psnr(rec, plane)))
    for (u0, b0, p0), (u1, b1, p1) in zip(results, results[1:]):
        assert b1 >= b0, results          # lower slope -> more bytes
        assert p1 >= p0 - 0.1, results    # and no worse quality
    # the sweep must actually span distinct operating points
    assert results[0][1] < results[-1][1], results


def test_reduced_resolution_decode():
    plane = _test_plane(64, 80)
    ef = frame_codec.encode_frame(plane, levels=3, reversible=True)
    half = frame_codec.decode_frame(ef, discard_levels=1)
    assert half.shape == (32, 40)
    quarter = frame_codec.decode_frame(ef, discard_levels=2)
    assert quarter.shape == (16, 20)
    # reduced decode must equal the LL band synthesis of the full decode:
    # i.e., downsampling the source twice through the same filter
    from qsvc_tpu.ops import dwt2d
    import jax.numpy as jnp
    ana = np.asarray(dwt2d.analyze(jnp.asarray(plane) - 128, 1, "5/3"))
    ll = np.clip(ana[:32, :40] + 128, 0, 255)
    np.testing.assert_array_equal(half, ll)


def test_odd_sizes_roundtrip():
    plane = _test_plane(50, 34)[..., :33]
    ef = frame_codec.encode_frame(plane, levels=2, reversible=True,
                                  codeblock_size=16)
    rec = frame_codec.decode_frame(ef)
    np.testing.assert_array_equal(rec, plane)


def test_sparse_selection_never_drops_surviving_blocks(rng):
    """The sparse path's conservative pre-selection (device R-D sim +
    margin, frame_codec.encode_frames_select_sparse) must never skip a
    block that full encoding + truncation would keep — for BOTH coders
    (the MQ criterion is relaxed by a compaction margin; this pins that
    the margin is sufficient on dense/sparse/deep content)."""
    from qsvc_tpu.codec import fast, frame_codec
    if not fast.available():
        import pytest
        pytest.skip("native library not built")
    planes = np.stack([
        rng.integers(0, 256, (96, 128)),
        (rng.normal(128, 3, (96, 128))).clip(0, 255),
        (128 + 120 * np.sin(np.arange(96 * 128).reshape(96, 128) / 700.0)),
    ]).astype(np.float32)
    for coder in ("bp", "mq"):
        for thr_slope in (44000.0, 45000.0, 45800.0):
            t = frame_codec.slope_to_threshold(thr_slope)
            full = frame_codec.encode_frames(planes, 2, reversible=False,
                                             delta=0.5, codeblock_size=32,
                                             min_threshold=0.0, coder=coder)
            sparse = frame_codec.encode_frames(planes, 2, reversible=False,
                                               delta=0.5, codeblock_size=32,
                                               min_threshold=t, coder=coder)
            for ff, sf in zip(full, sparse):
                tf = ff.truncate(t)
                keep = {(b.band_key, b.y0, b.x0) for b in tf.blocks
                        if b.data}
                got = {(b.band_key, b.y0, b.x0) for b in sf.blocks
                       if b.data}
                missing = keep - got
                assert not missing, (coder, thr_slope, missing)


def test_bp_decode_without_native_lib_raises(rng, monkeypatch):
    """A bp stream decoded on a machine without the native library must
    fail loudly on BOTH decode paths (the tier1-MQ python fallback would
    silently mis-decode bp data into garbage pixels)."""
    import pytest
    from qsvc_tpu.codec import fast, frame_codec
    if not fast.available():
        pytest.skip("native library not built (cannot produce bp data)")
    # sparse path: few surviving blocks (min_threshold prunes the rest)
    plane = np.full((1, 96, 128), 128, np.float32)
    plane[0, :8, :8] = rng.integers(0, 256, (8, 8))
    t = frame_codec.slope_to_threshold(45000.0)
    efs = frame_codec.encode_frames(plane, 2, reversible=False,
                                    delta=0.5, codeblock_size=32,
                                    min_threshold=t, coder="bp")
    monkeypatch.setattr(fast, "_lib", False)   # the canonical no-lib state
    with pytest.raises(RuntimeError, match="native"):
        frame_codec.decode_frames(efs)
    # dense path: full-noise plane (every block coded)
    monkeypatch.undo()
    dense = rng.integers(0, 256, (1, 96, 128)).astype(np.float32)
    efs2 = frame_codec.encode_frames(dense, 2, reversible=False,
                                     delta=0.5, codeblock_size=32,
                                     coder="bp")
    monkeypatch.setattr(fast, "_lib", False)
    with pytest.raises(RuntimeError, match="native"):
        frame_codec.decode_frames(efs2)
