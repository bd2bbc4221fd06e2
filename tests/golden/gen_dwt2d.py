"""Regenerate ``dwt2d_golden.npz`` from the reference C++ 2D DWT driver.

Compiles a driver against the unmodified reference headers
(/root/reference/trunk/src/{5_3,dwt2d}.cpp), re-runs every stored input
through ``dwt2d<short,_5_3<short>>::analyze/synthesize`` and rewrites the
npz.  ``--check`` verifies the committed file instead.

Usage:  python tests/golden/gen_dwt2d.py [--check]
"""

import os
import re
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/trunk/src"
NPZ = os.path.join(HERE, "dwt2d_golden.npz")

DRIVER = r"""
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include "5_3.cpp"
#include "dwt2d.cpp"

int main(int argc, char **argv) {
  int y = atoi(argv[1]), x = atoi(argv[2]), levels = atoi(argv[3]);
  short **img = new short*[y];
  for (int j = 0; j < y; j++) {
    img[j] = new short[x];
    fread(img[j], sizeof(short), x, stdin);
  }
  dwt2d<short, _5_3<short> > d;
  d.set_max_line_size(x > y ? x : y);
  d.analyze(img, y, x, levels);
  for (int j = 0; j < y; j++) fwrite(img[j], sizeof(short), x, stdout);
  d.synthesize(img, y, x, levels);
  for (int j = 0; j < y; j++) fwrite(img[j], sizeof(short), x, stdout);
  return 0;
}
"""


def main():
    check = "--check" in sys.argv
    g = dict(np.load(NPZ))
    cases = sorted(set(k.rsplit("_", 1)[0] for k in g))
    tmp = tempfile.mkdtemp(prefix="qsvc_dwt2d_")
    src = os.path.join(tmp, "driver.cpp")
    open(src, "w").write(DRIVER)
    exe = os.path.join(tmp, "driver")
    subprocess.run(["g++", "-O2", "-I", REF, "-fpermissive", "-w",
                    "-o", exe, src], check=True, capture_output=True)
    out = {}
    for case in cases:
        m = re.match(r"dwt2d_(\d+)x(\d+)_l(\d+)", case)
        h, w, levels = (int(v) for v in m.groups())
        orig = g[f"{case}_orig"].astype(np.int16)
        assert orig.shape == (h, w), (case, orig.shape)
        p = subprocess.run([exe, str(h), str(w), str(levels)],
                           input=orig.tobytes(), capture_output=True,
                           check=True)
        res = np.frombuffer(p.stdout, np.int16).reshape(2, h, w)
        out[f"{case}_orig"] = orig
        out[f"{case}_ana"] = res[0]
        out[f"{case}_syn"] = res[1]
    if check:
        bad = [k for k in g if not np.array_equal(g[k], out[k])]
        print("MISMATCH:" if bad else "OK:", len(bad), "of", len(g),
              "arrays differ")
        sys.exit(1 if bad else 0)
    np.savez_compressed(NPZ, **out)
    print("wrote", NPZ, len(out), "arrays")


if __name__ == "__main__":
    main()
