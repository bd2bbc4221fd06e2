"""Scaling-efficiency artifact: fps(1 device) vs fps(N devices) of the
sharded device encode step at a non-toy config (512x512, TRLs=3).

Methodology (round 5).  On the CPU backend each point runs in its OWN
subprocess with ``--xla_force_host_platform_device_count=N`` and the
process pinned to exactly N physical cores (``taskset``), so an
N-device point gets N cores — one per device — and the 1-device
baseline gets one.  Measured consequences of the alternatives (r4):
running every point inside one process with 8 forced virtual devices
depressed n=2 efficiency to 0.71; with per-point processes the same
program measures 0.80.  Beyond N == physical cores the measurement is
core-bound and says nothing about the codec (recorded as
``valid_up_to_n``).  On a real pod every device is its own chip, the
pinning is a no-op, and the full sweep applies.

Usage:  python tools/scaling_bench.py [--out SCALING_r05.json] [--cpu]
        [--ns 1,2] [--reps 3]
        (internal per-point mode: --point N)
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG_NOTE = ("512x512 TRLs=3 block=32 search=4 full encode step "
               "(MCTF + packed spatial DWT), encode_step_sharded, "
               "one pinned subprocess per point")


def run_point(n: int, reps: int) -> dict:
    """One measurement, in-process (spawned by the sweep)."""
    import time

    import jax
    from qsvc_tpu.utils import cachedir
    cachedir.configure(jax, os.path.join(REPO, "tests", ".jax_cache"))
    import numpy as np
    import jax.numpy as jnp
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video
    from qsvc_tpu.parallel import mesh as pmesh, transform as ptransform

    c = CodecConfig(pixels_in_x=512, pixels_in_y=512, TRLs=3,
                    block_size=32, search_range=4,
                    update_factor=float(os.environ.get(
                        "QSVC_SCALE_UF", "0.25")),
                    SRLs=4, GOPs=n)
    vid = synthetic_video(c.pictures, c.pixels_in_y, c.pixels_in_x,
                          seed=0)
    m = pmesh.make_mesh(n)

    def shard(a):
        return jnp.asarray(pmesh.put_sharded(
            pmesh.shard_gops(a.astype(np.int32), c.gop_size), m))

    gy, gu, gv = shard(vid.y), shard(vid.u), shard(vid.v)
    out = ptransform.encode_step_sharded(gy, gu, gv, c, m)
    jax.block_until_ready(out)                      # compile
    t0 = time.time()
    for _ in range(reps):
        out = ptransform.encode_step_sharded(gy, gu, gv, c, m)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    return {"n": n, "fps": vid.frames / dt, "dt": dt}


def _spawn(n: int, reps: int, cpu: bool, cores: str):
    """Launch one measurement subprocess pinned to ``cores``."""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags +
                            f" --xla_force_host_platform_device_count={n}"
                            ).strip()
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.abspath(__file__),
           "--point", str(n), "--reps", str(reps)]
    if shutil.which("taskset") and cores:
        cmd = ["taskset", "-c", cores] + cmd
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=env,
                            cwd=REPO)


def _result(proc, what: str) -> dict:
    out, err = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"{what} failed:\n{err[-2000:]}")
    return json.loads(out.strip().splitlines()[-1])


def spawn_point(n: int, reps: int, cpu: bool) -> dict:
    """Run one sharded point in a pinned subprocess (CPU methodology)."""
    cores = ",".join(str(i) for i in range(n))
    return _result(_spawn(n, reps, cpu, cores), f"point n={n}")


def spawn_independent_baseline(n: int, reps: int, cpu: bool) -> float:
    """Aggregate fps of ``n`` CONCURRENT single-device encodes, one per
    core: the same host resource sharing (memory bandwidth, LLC) as the
    n-device sharded point but ZERO distribution machinery — the honest
    denominator on a CPU proxy, where cores share bandwidth that pod
    chips do not.  efficiency = fps_sharded(n) / this."""
    procs = [_spawn(1, reps, cpu, str(i)) for i in range(n)]
    results = [_result(p, f"indep lane {i}") for i, p in enumerate(procs)]
    return sum(r["fps"] for r in results)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ns", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--point", type=int, default=0)
    args = ap.parse_args()

    if args.point:                        # internal per-point mode
        import jax
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            jax.config.update("jax_platforms", "cpu")
        print(json.dumps(run_point(args.point, args.reps)), flush=True)
        return 0

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend_is_cpu = args.cpu or jax.default_backend() == "cpu"
    cores = os.cpu_count() or 1
    ndev = cores if backend_is_cpu else len(jax.devices())
    ns = ([int(x) for x in args.ns.split(",")] if args.ns
          else sorted({n for n in (2, 4, 8) if n <= ndev}))

    if backend_is_cpu:
        base = spawn_point(1, args.reps, cpu=True)
    else:
        base = run_point(1, args.reps)
    fps_1 = base["fps"]
    print(json.dumps({"n": 1, "fps": round(fps_1, 4)}), flush=True)

    results = []
    for n in ns:
        p = (spawn_point(n, args.reps, cpu=True) if backend_is_cpu
             else run_point(n, args.reps))
        eff = p["fps"] / (n * fps_1)
        row = {
            "metric": "gop_parallel_scaling_efficiency",
            "value": round(eff, 4),
            "unit": "fraction",
            "detail": {"n_devices": n,
                       "fps_1": round(fps_1, 4),
                       "fps_n": round(p["fps"], 4),
                       "backend": "cpu" if backend_is_cpu
                       else jax.default_backend(),
                       "valid": (not backend_is_cpu) or n <= cores},
        }
        if backend_is_cpu and n <= cores:
            # separate the codec's distribution overhead from the CPU
            # proxy's shared memory bandwidth: n concurrent INDEPENDENT
            # single-device encodes see the same host contention with
            # zero distribution machinery
            indep = spawn_independent_baseline(n, args.reps, cpu=True)
            row["detail"]["fps_independent_aggregate"] = round(indep, 4)
            row["detail"]["efficiency_vs_independent"] = round(
                p["fps"] / indep, 4)
        print(json.dumps(row), flush=True)
        results.append(row)

    if args.out:
        artifact = {
            "config": CONFIG_NOTE,
            "backend": ("cpu (device_count=N per point, taskset-pinned "
                        "to N cores)" if backend_is_cpu
                        else jax.default_backend()),
            "host_cores": cores,
            "valid_up_to_n": cores if backend_is_cpu else ndev,
            "methodology": (
                "Each point runs in its own subprocess with exactly N "
                "virtual devices and N pinned cores, so efficiency = "
                "fps_n/(n*fps_1) compares one core per device against "
                "a one-core baseline and measures the sharded "
                "program's overhead (ppermute halos, skew) only. "
                "Running all points in one 8-device process (the r4 "
                "method) depressed n=2 efficiency to 0.71 for the "
                "same program. On a pod every device is its own chip "
                "and the whole sweep applies."),
            "points": results,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
