"""Scaling-efficiency harness: fps(1 device) vs fps(N devices) of the
sharded device encode step.  Runs on whatever backend is active — the
8-virtual-device CPU mesh here, chips on a pod slice.  Prints one JSON
line (BASELINE target: >= 80% efficiency at >= 2 hosts).

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py [N] --cpu

(--cpu forces the CPU backend via jax.config — the agent environment's
sitecustomize pins the tunneled TPU regardless of JAX_PLATFORMS.)
"""

import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    import jax
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    from qsvc_tpu.parallel import distributed as pdist

    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    r = pdist.measure_scaling(n)
    print(json.dumps({
        "metric": "gop_parallel_scaling_efficiency",
        "value": round(r["efficiency"], 4),
        "unit": "fraction",
        "detail": {"n_devices": r["n_devices"],
                   "fps_1": round(r["fps_1"], 2),
                   "fps_n": round(r["fps_n"], 2),
                   "backend": jax.default_backend()},
    }))
    return 0


if __name__ == "__main__":
    main()
