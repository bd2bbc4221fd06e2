"""Scaling-efficiency artifact: fps(1 device) vs fps(N devices) of the
sharded device encode step at a non-toy config (512x512, TRLs=3).

Runs on whatever backend is active — the 8-virtual-device CPU mesh here,
chips on a pod slice.  Writes ``SCALING_r{N}.json`` and prints one JSON
line per N (BASELINE target: >= 80% efficiency at >= 2 hosts).

Methodology note (CPU mesh): the N virtual devices SHARE the host's
physical cores, so beyond N == cores the measurement is core-bound and
says nothing about the codec; the honest efficiency reading is at
N <= cores (recorded as ``valid_up_to_n``).  On a real pod every device
is its own chip and the full sweep applies.

Usage:  python tools/scaling_bench.py [--out SCALING_r04.json] [--cpu]
        [--ns 1,2,4,8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ns", default="")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    repo = __file__.rsplit("/", 2)[0]
    from qsvc_tpu.utils import cachedir
    cachedir.configure(jax, os.path.join(repo, "tests", ".jax_cache"))
    from qsvc_tpu.parallel import distributed as pdist

    ndev = len(jax.devices())
    ns = ([int(x) for x in args.ns.split(",")] if args.ns
          else sorted({n for n in (2, 4, 8) if n <= ndev}))
    cores = os.cpu_count() or 1
    results = []
    for n in ns:
        r = pdist.measure_scaling(n, reps=args.reps)
        row = {
            "metric": "gop_parallel_scaling_efficiency",
            "value": round(r["efficiency"], 4),
            "unit": "fraction",
            "detail": {"n_devices": n,
                       "fps_1": round(r["fps_1"], 3),
                       "fps_n": round(r["fps_n"], 3),
                       "backend": jax.default_backend()},
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    if args.out:
        artifact = {
            "config": "512x512 TRLs=3 block=32 search=4 full encode step "
                      "(MCTF + packed spatial DWT), encode_step_sharded",
            "backend": jax.default_backend(),
            "host_cores": cores,
            "valid_up_to_n": (ndev if jax.default_backend() != "cpu"
                              else cores),
            "points": results,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
