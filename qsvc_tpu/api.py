"""Top-level codec API: compress / expand / psnr.

The one-process, on-device equivalent of the reference's pipeline
orchestrators (``compress.py:180-228``: analyze -> motion_compress ->
texture_compress; ``expand.py:214-256``: texture_expand -> motion_expand ->
synthesize).  The MCTF temporal transform and DWTs run jitted on the TPU;
EBCOT entropy coding runs in the native host path; everything flows through
arrays instead of files.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import CodecConfig
from .io.yuv import Video
from .mctf import motion_coding, transform
from .codec import codestream, frame_codec
from .codec.codestream import LevelSection, VideoStream
from .codec.frame_codec import slope_to_threshold


def _encode_plane_set(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                      levels: int, reversible: bool, delta: float,
                      codeblock: int, min_threshold: float = 0.0,
                      coder: str = "mq"
                      ) -> List[Dict[str, frame_codec.EncodedFrame]]:
    """Batched per-component encode: one device DWT + one native EBCOT
    batch per component stack."""
    ey = frame_codec.encode_frames(y, levels, reversible, delta, codeblock,
                                   min_threshold, coder)
    eu = frame_codec.encode_frames(u, levels, reversible, delta, codeblock,
                                   min_threshold, coder)
    ev = frame_codec.encode_frames(v, levels, reversible, delta, codeblock,
                                   min_threshold, coder)
    return [{"y": a, "u": b, "v": c} for a, b, c in zip(ey, eu, ev)]


def _decode_plane_set(frames: List[Dict[str, frame_codec.EncodedFrame]],
                      threshold: float = 0.0, discard_levels: int = 0
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    ys = frame_codec.decode_frames([fr["y"] for fr in frames], threshold,
                                   discard_levels)
    us = frame_codec.decode_frames([fr["u"] for fr in frames], threshold,
                                   discard_levels)
    vs = frame_codec.decode_frames([fr["v"] for fr in frames], threshold,
                                   discard_levels)
    return ys, us, vs


def compress(video: Video, cfg: CodecConfig, reversible: bool = True,
             delta: Optional[float] = None, lossless: Optional[bool] = None
             ) -> VideoStream:
    """Encode a video to a :class:`VideoStream`.

    ``reversible``: use the integer 5/3 texture path (plus no quantization)
    — with ``lossless=True`` (default when reversible and
    ``quantization_texture <= 0``) nothing is truncated and intra-only
    streams decode bit-exactly.  Otherwise blocks are truncated at the
    per-subband slope thresholds from ``cfg.slopes()``
    (texture_compress.py:148-176 rate-allocation policy).
    """
    cfg.validate()
    if lossless is None:
        lossless = reversible and cfg.quantization_texture <= 0
    if delta is None:
        # tie the 9/7 base quantization step to the operating point: finer
        # than the truncation threshold needs, but no finer — deep planes
        # that any truncation would drop are then never produced (the
        # equivalent of choosing Qstep to match -slope in Kakadu)
        if not reversible and not lossless and cfg.quantization_texture > 0:
            t = slope_to_threshold(float(cfg.quantization_texture))
            delta = float(np.clip(math.sqrt(t) / 8.0, 0.125, 8.0))
        else:
            delta = 0.125
    from .codec import fast as _fast
    coder = cfg.texture_coder if _fast.available() else "mq"
    # upload 1 byte/pixel; widening happens on device inside analyze
    y = jnp.asarray(np.asarray(video.y, np.uint8))
    u = jnp.asarray(np.asarray(video.u, np.uint8))
    v = jnp.asarray(np.asarray(video.v, np.uint8))
    if cfg.TRLs > 1:
        stream = transform.analyze_jit(y, u, v, cfg)
    else:
        stream = transform.MCTFStream(y.astype(jnp.int32),
                                      u.astype(jnp.int32),
                                      v.astype(jnp.int32), ())
    srl_levels = cfg.SRLs - 1
    cb = cfg.codeblock_size

    slopes = cfg.slopes()

    def thr(row: int) -> float:
        if lossless:
            return 0.0
        return slope_to_threshold(slopes[row][0])

    def trunc(frames, row):
        t = thr(row)
        if t <= 0:
            return frames
        return [{c: ef.truncate(t) for c, ef in fr.items()} for fr in frames]

    # Pipelined texture encode: dispatch every component stack's fused
    # device DWT+quantize+tile first (device work overlaps), fetch only the
    # tiny per-tile significance stats, gather and transfer only the
    # code-blocks that will actually be coded, and run the native entropy
    # coder on a worker while this thread drains the next stack's transfer
    # (ctypes releases the GIL).
    stacks = [(stream.low_y, thr(0)), (stream.low_u, thr(0)),
              (stream.low_v, thr(0))]
    for t, lev in enumerate(stream.levels, start=1):
        mt = thr(cfg.TRLs - t)
        stacks += [(lev.high_y, mt), (lev.high_u, mt), (lev.high_v, mt)]
    pendings = [frame_codec.encode_frames_dispatch_sparse(
        p, srl_levels, reversible, delta, cb) for (p, _) in stacks]

    mv_fields = [lev.mv for lev in stream.levels]
    residues = (jax.device_get(motion_coding.decorrelate_jit(mv_fields))
                if mv_fields else [])

    selecteds = [frame_codec.encode_frames_select_sparse(pend, mt, coder)
                 for pend, (_, mt) in zip(pendings, stacks)]
    with ThreadPoolExecutor(max_workers=1) as ex:
        futs = []
        for sel, pend, (_, mt) in zip(selecteds, pendings, stacks):
            H, W = pend[0].shape[1], pend[0].shape[2]
            if sel[0] == "sparse":
                sel = sel[:1] + (np.asarray(sel[1]),) + sel[2:]
            futs.append(ex.submit(frame_codec.encode_frames_finish_sparse,
                                  sel, H, W, mt, coder))
        encoded = [f.result() for f in futs]

    def plane_set(idx):
        return [{"y": a, "u": b, "v": c} for a, b, c in
                zip(encoded[idx], encoded[idx + 1], encoded[idx + 2])]

    low = trunc(plane_set(0), 0)

    levels: List[LevelSection] = []
    for t, lev in enumerate(stream.levels, start=1):
        high = trunc(plane_set(3 * t), cfg.TRLs - t)
        res = np.asarray(residues[t - 1])
        motion = [codestream.encode_motion_field(res[i])
                  for i in range(res.shape[0])]
        ftypes = bytes(b"B"[0] if b else b"I"[0]
                       for b in np.asarray(lev.is_B))
        levels.append(LevelSection(high, motion, ftypes))

    return VideoStream(cfg, reversible, delta, low, levels)


def expand(vs: VideoStream, threshold: float = 0.0,
           discard_TRLs: int = 0) -> Video:
    """Decode a :class:`VideoStream` back to video.

    ``threshold``: extra decode-time slope-threshold truncation (QS).
    ``discard_TRLs``: drop the finest ``d`` temporal levels — decodes at
    reduced frame rate (TS extraction, transcode.py semantics).
    """
    cfg = vs.cfg
    ly, lu, lv = _decode_plane_set(vs.low, threshold)
    use_levels = vs.levels[discard_TRLs:] if discard_TRLs else vs.levels

    lev_data = []
    schedule = cfg.level_schedule()[discard_TRLs:]
    for t, lev in enumerate(use_levels):
        hy, hu, hv = _decode_plane_set(lev.high, threshold)
        res = [codestream.decode_motion_field(m) for m in lev.motion]
        lev_data.append((hy, hu, hv, np.stack(res) if res else None,
                         np.frombuffer(lev.frame_types, np.uint8) ==
                         ord("B")))

    # reconstruct motion fields (inverse inter-level/bidirectional coding)
    residue_fields = [jnp.asarray(d[3]) for d in lev_data if d[3] is not None]
    if residue_fields:
        mv_fields = motion_coding.correlate_jit(residue_fields)
    else:
        mv_fields = []

    levels = []
    for i, (hy, hu, hv, _res, is_b) in enumerate(lev_data):
        levels.append(transform.LevelData(
            jnp.asarray(hy), jnp.asarray(hu), jnp.asarray(hv),
            mv_fields[i].astype(jnp.int32), jnp.asarray(is_b)))

    sub_cfg = cfg if not discard_TRLs else cfg.replace(
        TRLs=cfg.TRLs - discard_TRLs,
        GOPs=cfg.GOPs * (2 ** discard_TRLs) if cfg.TRLs - discard_TRLs > 1
        else cfg.GOPs)
    mstream = transform.MCTFStream(jnp.asarray(ly), jnp.asarray(lu),
                                   jnp.asarray(lv), tuple(levels))
    if len(levels) == 0:
        ry, ru, rv = mstream.low_y, mstream.low_u, mstream.low_v
    else:
        ry, ru, rv = _synthesize_partial(mstream, cfg, discard_TRLs)
    return Video(np.asarray(ry).astype(np.uint8),
                 np.asarray(ru).astype(np.uint8),
                 np.asarray(rv).astype(np.uint8))


def _synthesize_partial(mstream: transform.MCTFStream, cfg: CodecConfig,
                        discard_TRLs: int):
    """Inverse MCTF over the kept levels only (TS extraction decodes the
    coarser levels with their own schedule entries)."""
    schedule = cfg.level_schedule()
    low = (mstream.low_y, mstream.low_u, mstream.low_v)
    kept = schedule[discard_TRLs:]
    for lp, lev in zip(reversed(kept), reversed(mstream.levels)):
        low = transform._synthesize_level(low, lev, lp.block_size,
                                          lp.search_range, cfg)
    return low


def compress_bytes(video: Video, cfg: CodecConfig, **kw) -> bytes:
    return compress(video, cfg, **kw).to_bytes()


def expand_bytes(data: bytes, **kw) -> Video:
    return expand(VideoStream.from_bytes(data), **kw)
