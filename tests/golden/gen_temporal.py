"""Generate temporal-path golden vectors from the reference C++ binaries.

Compiles the reference MCTF stage executables (split, motion_estimate,
decorrelate, update — trunk/src, forward builds with -D ANALYZE) into a
temp dir, runs ONE temporal level on a tiny deterministic sequence with
the exact flag set of ``analyze_step.py:115-232``, and stores every
intermediate in ``temporal_golden.npz``:

  inputs : y/u/v           (5, 48, 64)+(5, 24, 32)x2 uint8, seed 21
  outputs: motion          (2, 2, 2, 3, 4) int16  (pairs, dir, comp, By, Bx)
           motion_filtered (same; zeroed for I frames)
           frame_types     2 bytes 'I'/'B'
           high y/u/v      (2, ...) uint8 biased residues
           low  y/u/v      (3, ...) uint8 updated evens

``update`` is built with ``-D UPDATE_STEP`` — the reference's *intended*
chroma-residue interpolation path (update.cpp:522-543).  The default
build leaves it undefined and indexes stale memory beyond the chroma
quadrant (a latent bug this framework deliberately does not replicate,
see mctf/update.py).

Usage:  python tests/golden/gen_temporal.py   (writes next to itself)
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/trunk/src"

W, H = 64, 48
PICTURES = 5
BLOCK = 16
SR = 2
UF = 0.25

sys.path.insert(0, os.path.join(HERE, "..", ".."))
from qsvc_tpu.io import synthetic_video  # noqa: E402


def main():
    vid = synthetic_video(PICTURES, H, W, seed=21)
    tmp = tempfile.mkdtemp(prefix="qsvc_golden_")

    def cc(out, src, defs, extra_src=()):
        cmd = (["g++", "-O2", "-I", REF] + defs + ["-o", out,
                os.path.join(REF, src)] + list(extra_src))
        subprocess.run(cmd, check=True, capture_output=True)
        return out

    split = cc(os.path.join(tmp, "split"), "split.cpp", ["-D", "ANALYZE"])
    me = cc(os.path.join(tmp, "motion_estimate"), "motion_estimate.cpp", [])
    dec = cc(os.path.join(tmp, "decorrelate"), "decorrelate.cpp",
             ["-D", "ANALYZE"],
             [os.path.join(REF, "entropy.cpp")])
    upd = cc(os.path.join(tmp, "update"), "update.cpp",
             ["-D", "ANALYZE", "-D", "UPDATE_STEP"])

    # low_0: per frame Y, U, V planes, uint8
    with open(os.path.join(tmp, "low_0"), "wb") as f:
        for i in range(PICTURES):
            f.write(vid.y[i].astype(np.uint8).tobytes())
            f.write(vid.u[i].astype(np.uint8).tobytes())
            f.write(vid.v[i].astype(np.uint8).tobytes())

    def run(binpath, **kw):
        args = [binpath] + [f"--{k}={v}" for k, v in kw.items()]
        subprocess.run(args, check=True, cwd=tmp, capture_output=True)

    run(split, even_fn="even_1", low_fn="low_0", odd_fn="odd_1",
        pictures=PICTURES, pixels_in_x=W, pixels_in_y=H)
    run(me, block_size=BLOCK, border_size=0, even_fn="even_1",
        imotion_fn="/dev/zero", motion_fn="motion_1", odd_fn="odd_1",
        pictures=PICTURES, pixels_in_x=W, pixels_in_y=H, search_range=SR,
        subpixel_accuracy=0)
    run(dec, block_overlaping=0, block_size=BLOCK, even_fn="even_1",
        frame_types_fn="frame_types_1", high_fn="high_1",
        motion_in_fn="motion_1", motion_out_fn="motion_filtered_1",
        odd_fn="odd_1", pictures=PICTURES, pixels_in_x=W, pixels_in_y=H,
        search_range=SR, subpixel_accuracy=0, always_B=0)
    run(upd, block_size=BLOCK, even_fn="even_1",
        frame_types_fn="frame_types_1", high_fn="high_1", low_fn="low_1",
        motion_fn="motion_filtered_1", pictures=PICTURES, pixels_in_x=W,
        pixels_in_y=H, subpixel_accuracy=0, update_factor=UF)

    pairs = PICTURES // 2
    By, Bx = H // BLOCK, W // BLOCK

    def load_motion(name):
        raw = np.fromfile(os.path.join(tmp, name), np.int16)
        return raw.reshape(pairs, 2, 2, By, Bx)

    def load_frames(name, n):
        raw = np.fromfile(os.path.join(tmp, name), np.uint8)
        fsz = H * W + 2 * (H // 2) * (W // 2)
        raw = raw[:n * fsz].reshape(n, fsz)
        y = raw[:, :H * W].reshape(n, H, W)
        u = raw[:, H * W:H * W + (H // 2) * (W // 2)].reshape(
            n, H // 2, W // 2)
        v = raw[:, H * W + (H // 2) * (W // 2):].reshape(n, H // 2, W // 2)
        return y, u, v

    ftypes = open(os.path.join(tmp, "frame_types_1"), "rb").read()
    hy, hu, hv = load_frames("high_1", pairs)
    ly, lu, lv = load_frames("low_1", PICTURES - pairs)

    np.savez_compressed(
        os.path.join(HERE, "temporal_golden.npz"),
        y=vid.y, u=vid.u, v=vid.v,
        motion=load_motion("motion_1"),
        motion_filtered=load_motion("motion_filtered_1"),
        frame_types=np.frombuffer(ftypes, np.uint8),
        high_y=hy, high_u=hu, high_v=hv,
        low_y=ly, low_u=lu, low_v=lv,
        meta=np.asarray([W, H, PICTURES, BLOCK, SR]))
    print("wrote", os.path.join(HERE, "temporal_golden.npz"))
    print("frame_types:", ftypes)


if __name__ == "__main__":
    main()
