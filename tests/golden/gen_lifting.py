"""Regenerate ``lifting_golden.npz`` from the reference C++ filter banks.

Compiles a small driver against the UNMODIFIED reference headers
(/root/reference/trunk/src/{Haar,5_3,13_7}.cpp) and re-runs every case's
stored input signal through the even/odd analyze + synthesize pairs,
exactly as the original golden generation did.  Run with ``--check`` to
verify the committed file instead of overwriting it.

Usage:  python tests/golden/gen_lifting.py [--check]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/trunk/src"
NPZ = os.path.join(HERE, "lifting_golden.npz")

DRIVER = r"""
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include "Haar.cpp"
#include "5_3.cpp"
#include "13_7.cpp"

template <class FB>
static void run(int n) {
  FB fb;
  short *s = new short[n + 4];
  short *l = new short[n + 4];
  short *h = new short[n + 4];
  short *r = new short[n + 4];
  fread(s, sizeof(short), n, stdin);
  int nl = (n + 1) / 2, nh = n / 2;
  if (n % 2) { fb.odd_analyze(s, l, h, n); }
  else       { fb.even_analyze(s, l, h, n); }
  memcpy(r, l, nl * sizeof(short));
  memcpy(r + nl, h, nh * sizeof(short));
  // synthesize in place from packed [l|h] (the reference drivers reuse
  // the same buffers)
  short *rl = new short[n + 4];
  short *rh = new short[n + 4];
  memcpy(rl, l, nl * sizeof(short));
  memcpy(rh, h, nh * sizeof(short));
  short *out = new short[n + 4];
  if (n % 2) { fb.odd_synthesize(out, rl, rh, n); }
  else       { fb.even_synthesize(out, rl, rh, n); }
  fwrite(l, sizeof(short), nl, stdout);
  fwrite(h, sizeof(short), nh, stdout);
  fwrite(out, sizeof(short), n, stdout);
}

int main(int argc, char **argv) {
  int n = atoi(argv[2]);
  if (!strcmp(argv[1], "haar")) run<Haar<short> >(n);
  else if (!strcmp(argv[1], "53")) run<_5_3<short> >(n);
  else if (!strcmp(argv[1], "137")) run<_13_7<short> >(n);
  else return 1;
  return 0;
}
"""


def main():
    check = "--check" in sys.argv
    g = dict(np.load(NPZ))
    cases = sorted(set(k.rsplit("_", 1)[0] for k in g))
    tmp = tempfile.mkdtemp(prefix="qsvc_lift_")
    src = os.path.join(tmp, "driver.cpp")
    open(src, "w").write(DRIVER)
    exe = os.path.join(tmp, "driver")
    subprocess.run(["g++", "-O2", "-I", REF, "-fpermissive", "-w",
                    "-o", exe, src], check=True, capture_output=True)
    out = {}
    for case in cases:
        filt, n = case.rsplit("_", 1)
        n = int(n)
        s = g[f"{case}_s"].astype(np.int16)
        p = subprocess.run([exe, filt, str(n)], input=s.tobytes(),
                           capture_output=True, check=True)
        res = np.frombuffer(p.stdout, np.int16)
        nl, nh = (n + 1) // 2, n // 2
        out[f"{case}_s"] = s
        out[f"{case}_l"] = res[:nl]
        out[f"{case}_h"] = res[nl:nl + nh]
        out[f"{case}_r"] = res[nl + nh:nl + nh + n]
    if check:
        bad = [k for k in g if not np.array_equal(g[k], out[k])]
        print("MISMATCH:" if bad else "OK:", len(bad), "of", len(g),
              "arrays differ")
        sys.exit(1 if bad else 0)
    np.savez_compressed(NPZ, **out)
    print("wrote", NPZ, len(out), "arrays")


if __name__ == "__main__":
    main()
