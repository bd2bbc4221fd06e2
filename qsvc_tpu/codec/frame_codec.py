"""Per-frame texture codec: DWT + quantization + EBCOT over code-blocks.

This is the framework's replacement for the reference's per-frame
``kdu_compress`` / ``kdu_expand`` calls (texture_compress_fb_j2k.py:183-196,
texture_expand_fb_j2k.py:152-177): DC level shift, ``SRLs-1``-level 2D DWT
(reversible integer 5/3 or irreversible CDF 9/7), deadzone quantization
(9/7 path), and EBCOT Tier-1 coding of each code-block with per-pass
rate/distortion recorded.  Every pass carries a distortion-length slope on
the block's convex hull, so quality-layer formation and bitstream
extraction are sorts/slices over recorded slopes instead of the reference's
decode-probe search (transcode.py:535-790).

The DWT runs on device (jit); Tier-1 runs on host — numpy reference here,
C++/OpenMP fast path via :mod:`.fast` when built.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import dwt2d
from . import fast, subbands, tier1

#: slope-unit mapping: threshold T(u) = 2**((u - SLOPE_ANCHOR)/256), chosen
#: so the reference's useful 42000-46000 slope range spans the useful
#: distortion-per-byte range of 8-bit video (42000 ~ near-transparent,
#: 45000 ~ mid-rate, 46000 ~ very low rate; calibrated on 1080p content).
SLOPE_ANCHOR = 43500.0


def slope_to_threshold(u: float) -> float:
    return float(2.0 ** ((float(u) - SLOPE_ANCHOR) / 256.0))


def threshold_to_slope(t: float) -> float:
    if t <= 0:
        return 0.0
    return SLOPE_ANCHOR + 256.0 * math.log2(t)


@dataclass
class EncodedBlock:
    band_key: str
    level: int
    band: str
    y0: int
    x0: int
    shape: Tuple[int, int]
    msbs: int
    data: bytes
    pass_ends: List[int]
    pass_slopes: List[float]        # hull slope (weighted SSE per byte)

    @property
    def num_passes(self) -> int:
        return len(self.pass_ends)

    def truncate(self, threshold: float) -> "EncodedBlock":
        """Keep only passes whose hull slope >= threshold (no re-encode)."""
        n = 0
        for s in self.pass_slopes:
            if s >= threshold:
                n += 1
            else:
                break
        end = self.pass_ends[n - 1] if n else 0
        return EncodedBlock(self.band_key, self.level, self.band, self.y0,
                            self.x0, self.shape, self.msbs, self.data[:end],
                            self.pass_ends[:n], self.pass_slopes[:n])

    def passes_for_threshold(self, threshold: float) -> int:
        n = 0
        for s in self.pass_slopes:
            if s >= threshold:
                n += 1
            else:
                break
        return n


@dataclass
class EncodedFrame:
    H: int
    W: int
    levels: int
    reversible: bool
    delta: float                     # base quantization step (9/7 path)
    codeblock_size: int
    blocks: List[EncodedBlock]

    @property
    def total_bytes(self) -> int:
        return sum(len(b.data) for b in self.blocks)

    def truncate(self, threshold: float) -> "EncodedFrame":
        return EncodedFrame(self.H, self.W, self.levels, self.reversible,
                            self.delta, self.codeblock_size,
                            [b.truncate(threshold) for b in self.blocks])


@partial(jax.jit, static_argnames=("levels", "reversible"))
def _dwt_device(plane: jnp.ndarray, levels: int, reversible: bool):
    """Forward texture DWT; batches over any leading axes."""
    if reversible:
        return dwt2d.analyze(plane.astype(jnp.int32) - 128, levels, "5/3")
    return dwt2d.analyze(plane.astype(jnp.float32) - 128.0, levels, "9/7")


@partial(jax.jit, static_argnames=("levels", "reversible"))
def _idwt_device(packed: jnp.ndarray, levels: int, reversible: bool):
    if reversible:
        rec = dwt2d.synthesize(packed, levels, "5/3") + 128
    else:
        rec = dwt2d.synthesize(packed, levels, "9/7") + 128.0
    return jnp.clip(jnp.round(rec), 0, 255).astype(jnp.int32)


def _hull_slopes(pass_ends: Sequence[int], dists: Sequence[float],
                 dist0: float, weight: float) -> List[float]:
    """Convex-hull distortion-length slopes; non-hull passes inherit the
    slope of the hull segment that covers them (so threshold truncation is
    monotone and never cuts inside a hull segment)."""
    n = len(pass_ends)
    if n == 0:
        return []
    rates = [0] + list(pass_ends)
    dd = [dist0] + list(dists)
    # convex hull (lower envelope) over (rate, dist)
    hull = [0]
    for i in range(1, n + 1):
        while len(hull) >= 1:
            j = hull[-1]
            if rates[i] <= rates[j]:
                if dd[i] < dd[j]:
                    hull.pop()
                    continue
                break
            s_new = (dd[j] - dd[i]) / (rates[i] - rates[j])
            if len(hull) >= 2:
                k = hull[-2]
                s_old = (dd[k] - dd[j]) / max(rates[j] - rates[k], 1e-12)
                if s_new >= s_old:
                    hull.pop()
                    continue
            if s_new <= 0:
                hull.pop()
                continue
            break
        hull.append(i)
    # slope per pass = hull-segment slope covering that pass
    slopes = [0.0] * n
    prev = hull[0]
    for idx in hull[1:]:
        s = (dd[prev] - dd[idx]) / max(rates[idx] - rates[prev], 1e-12)
        for p in range(prev, idx):
            slopes[p] = s * weight
        prev = idx
    for p in range(prev, n):
        slopes[p] = 0.0
    # enforce monotone non-increasing slopes (numerical safety)
    for p in range(1, n):
        if slopes[p] > slopes[p - 1]:
            slopes[p] = slopes[p - 1]
    return slopes


def encode_frames(planes: np.ndarray, levels: int, reversible: bool = True,
                  delta: float = 0.125, codeblock_size: int = 64,
                  min_threshold: float = 0.0) -> List[EncodedFrame]:
    """Encode a stack of component planes (N, H, W) with ONE device DWT
    call and ONE native batch over all code-blocks of all frames — the
    production path (per-frame calls pay a device round trip each)."""
    planes = np.asarray(planes)
    N = planes.shape[0]
    packed_all = np.asarray(_dwt_device(jnp.asarray(planes), levels,
                                        reversible))
    H, W = planes.shape[1], planes.shape[2]
    layout = subbands.band_layout(H, W, levels)
    tiles: List[np.ndarray] = []
    bands: List[str] = []
    meta: List[Tuple] = []
    min_slopes: List[float] = []
    for n in range(N):
        packed = packed_all[n]
        for b in layout:
            region = packed[b.y0:b.y0 + b.h, b.x0:b.x0 + b.w]
            if reversible:
                q = region.astype(np.int64)
                w = subbands.band_gain(b.band, b.level, True)
            else:
                q = np.trunc(region / delta).astype(np.int64)
                w = subbands.band_gain(b.band, b.level, False) * delta * delta
            for (ty, tx, th, tw) in subbands.codeblock_tiles(
                    b.h, b.w, codeblock_size):
                tiles.append(q[ty:ty + th, tx:tx + tw])
                bands.append(b.band)
                meta.append((n, b, ty, tx, th, tw, w))
                min_slopes.append(min_threshold / w / 8.0
                                  if min_threshold > 0 else 0.0)
    encoded = fast.encode_codeblocks_batch(tiles, bands, min_slopes
                                           if min_threshold > 0 else None)
    per_frame: List[List[EncodedBlock]] = [[] for _ in range(N)]
    for cb, (n, b, ty, tx, th, tw, w) in zip(encoded, meta):
        slopes = _hull_slopes(cb.pass_ends, cb.pass_dist, cb.dist0, w)
        per_frame[n].append(EncodedBlock(
            b.key, b.level, b.band, ty, tx, (th, tw), cb.msbs,
            cb.data, cb.pass_ends, slopes))
    return [EncodedFrame(H, W, levels, reversible, delta, codeblock_size,
                         blocks) for blocks in per_frame]


def decode_frames(efs: List[EncodedFrame], threshold: float = 0.0,
                  discard_levels: int = 0) -> np.ndarray:
    """Decode a stack of same-geometry frames with ONE native batch and
    ONE device inverse-DWT call; returns (N, H', W')."""
    if not efs:
        return np.zeros((0, 0, 0), np.int32)
    ef0 = efs[0]
    H, W, levels = ef0.H, ef0.W, ef0.levels
    layout = subbands.band_layout(H, W, levels)
    by_key = {}
    for b in layout:
        by_key.setdefault(b.key, b)
    todo = []
    todo_pos = []
    for n, ef in enumerate(efs):
        for blk in ef.blocks:
            if blk.level <= discard_levels and blk.band != "LL":
                continue
            np_ = (blk.num_passes if threshold <= 0
                   else blk.passes_for_threshold(threshold))
            todo.append((blk.data, blk.msbs, np_, blk.shape, blk.band,
                         blk.pass_ends))
            todo_pos.append((n, blk))
    decoded = fast.decode_codeblocks_batch(todo)
    dtype = np.int64 if ef0.reversible else np.float64
    packed = np.zeros((len(efs), H, W), dtype)
    for (n, blk), tile in zip(todo_pos, decoded):
        b = by_key[blk.band_key]
        if not ef0.reversible:
            v = tile.astype(np.float64)
            adj = np.where(v > 0, 0.5, np.where(v < 0, -0.5, 0.0))
            v = (v + adj) * ef0.delta
        else:
            v = tile
        packed[n, b.y0 + blk.y0:b.y0 + blk.y0 + blk.shape[0],
               b.x0 + blk.x0:b.x0 + blk.x0 + blk.shape[1]] = v
    if discard_levels:
        sizes_y = dwt2d._level_sizes(H, discard_levels)
        sizes_x = dwt2d._level_sizes(W, discard_levels)
        rh, rw = sizes_y[-1], sizes_x[-1]
        sub = packed[:, :rh, :rw]
        arr = jnp.asarray(sub if ef0.reversible else sub.astype(np.float32))
        return np.asarray(_idwt_device(arr, levels - discard_levels,
                                       ef0.reversible))
    arr = jnp.asarray(packed if ef0.reversible
                      else packed.astype(np.float32))
    return np.asarray(_idwt_device(arr, levels, ef0.reversible))


def encode_frame(plane: np.ndarray, levels: int, reversible: bool = True,
                 delta: float = 0.125, codeblock_size: int = 64,
                 min_threshold: float = 0.0) -> EncodedFrame:
    """Encode one component plane (uint8-range values).

    ``min_threshold``: weighted-slope floor — planes whose distortion-length
    slope falls well below it are never coded (they cannot survive
    truncation at that threshold), which skips most deep bit-planes at
    lossy operating points."""
    H, W = plane.shape
    packed = np.asarray(_dwt_device(jnp.asarray(plane), levels, reversible))
    layout = subbands.band_layout(H, W, levels)
    tiles: List[np.ndarray] = []
    bands: List[str] = []
    meta: List[Tuple] = []
    min_slopes: List[float] = []
    for b in layout:
        region = packed[b.y0:b.y0 + b.h, b.x0:b.x0 + b.w]
        if reversible:
            q = region.astype(np.int64)
            w = subbands.band_gain(b.band, b.level, True)
        else:
            q = np.trunc(region / delta).astype(np.int64)   # deadzone
            w = subbands.band_gain(b.band, b.level, False) * delta * delta
        for (ty, tx, th, tw) in subbands.codeblock_tiles(b.h, b.w,
                                                         codeblock_size):
            tiles.append(q[ty:ty + th, tx:tx + tw])
            bands.append(b.band)
            meta.append((b, ty, tx, th, tw, w))
            # /8 margin: early stop only after the slope is far below the
            # truncation point, so hull non-convexities are not cut short
            min_slopes.append(min_threshold / w / 8.0
                              if min_threshold > 0 else 0.0)
    encoded = fast.encode_codeblocks_batch(tiles, bands, min_slopes
                                           if min_threshold > 0 else None)
    blocks: List[EncodedBlock] = []
    for cb, (b, ty, tx, th, tw, w) in zip(encoded, meta):
        slopes = _hull_slopes(cb.pass_ends, cb.pass_dist, cb.dist0, w)
        blocks.append(EncodedBlock(
            b.key, b.level, b.band, ty, tx, (th, tw), cb.msbs,
            cb.data, cb.pass_ends, slopes))
    return EncodedFrame(H, W, levels, reversible, delta, codeblock_size,
                        blocks)


def decode_frame(ef: EncodedFrame,
                 threshold: float = 0.0,
                 discard_levels: int = 0) -> np.ndarray:
    """Decode a frame, optionally truncating by slope threshold (QS) and
    discarding the finest ``discard_levels`` resolution levels (SS — the
    reference's ``-reduce`` / ``--discard_SRLs``, transcode.py:558-582).

    With ``discard_levels = d`` the returned plane has the dimensions of the
    d-times-reduced image (the LL_d band geometry).
    """
    layout = subbands.band_layout(ef.H, ef.W, ef.levels)
    H, W = ef.H, ef.W
    dtype = np.int64 if ef.reversible else np.float64
    packed = np.zeros((H, W), dtype)
    by_key = {}
    for b in layout:
        by_key.setdefault(b.key, b)
    todo = []
    todo_blk = []
    for blk in ef.blocks:
        if blk.level <= discard_levels and blk.band != "LL":
            continue
        n = (blk.num_passes if threshold <= 0
             else blk.passes_for_threshold(threshold))
        todo.append((blk.data, blk.msbs, n, blk.shape, blk.band,
                     blk.pass_ends))
        todo_blk.append(blk)
    decoded = fast.decode_codeblocks_batch(todo)
    for blk, tile in zip(todo_blk, decoded):
        b = by_key[blk.band_key]
        if not ef.reversible:
            v = tile.astype(np.float64)
            adj = np.where(v > 0, 0.5, np.where(v < 0, -0.5, 0.0))
            v = (v + adj) * ef.delta
        else:
            v = tile
        packed[b.y0 + blk.y0:b.y0 + blk.y0 + blk.shape[0],
               b.x0 + blk.x0:b.x0 + blk.x0 + blk.shape[1]] = v
    if discard_levels:
        # reduced-resolution decode: synthesize only the coarser levels
        sizes_y = dwt2d._level_sizes(H, discard_levels)
        sizes_x = dwt2d._level_sizes(W, discard_levels)
        rh, rw = sizes_y[-1], sizes_x[-1]
        sub = packed[:rh, :rw]
        arr = jnp.asarray(sub if ef.reversible else sub.astype(np.float32))
        out = _idwt_device(arr, ef.levels - discard_levels, ef.reversible)
        return np.asarray(out)
    arr = jnp.asarray(packed if ef.reversible else packed.astype(np.float32))
    return np.asarray(_idwt_device(arr, ef.levels, ef.reversible))
