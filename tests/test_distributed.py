"""Multi-host distribution: two real OS processes joined through
``jax.distributed`` (localhost coordinator, CPU backend), GOPs split by
owning process, per-GOP byte streams gathered across hosts."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from qsvc_tpu.parallel import distributed as pdist

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import numpy as np
sys.path.insert(0, %(repo)r)
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu import api
from qsvc_tpu.parallel import distributed as pdist

assert jax.process_count() == 2
assert len(jax.devices()) == 4          # 2 local x 2 processes

cfg = CodecConfig(pixels_in_x=32, pixels_in_y=32, TRLs=2, GOPs=4,
                  block_size=16, search_range=2, update_factor=0.25,
                  quantization_texture=0, SRLs=2)
vid = synthetic_video(cfg.pictures, 32, 32, seed=17)
mesh = pdist.make_gop_mesh(4)
streams = pdist.encode_gops_distributed(vid, cfg, mesh, reversible=True)
assert len(streams) == 4 and all(isinstance(s, bytes) and s
                                 for s in streams)
rec = api.expand_gops([api.VideoStream.from_bytes(s) for s in streams])
assert rec.y.shape == vid.y.shape
import hashlib
print("HASH", hashlib.sha256(b"".join(streams)).hexdigest(), flush=True)
print("PSNR", float(np.abs(rec.y.astype(int) - vid.y.astype(int)).mean()),
      flush=True)
"""


@pytest.mark.skipif(jax.process_count() > 1,
                    reason="already inside a distributed run")
def test_two_process_gop_encode(tmp_path):
    """Spawns 2 coordinator-joined processes; both must produce the SAME
    ordered stream list (the allgather is consistent) and a decodable
    sequence."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": repo})
    coord = "localhost:19717"
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    h = [l.split()[1] for o in outs for l in o.splitlines()
         if l.startswith("HASH")]
    assert len(h) == 2 and h[0] == h[1], h


def test_encode_gops_distributed_single_process():
    """Single-process degradation: same API, local mesh."""
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video
    from qsvc_tpu import api
    n = min(len(jax.devices()), 4)
    if n < 2:
        pytest.skip("needs >= 2 devices")
    cfg = CodecConfig(pixels_in_x=32, pixels_in_y=32, TRLs=2, GOPs=n,
                      block_size=16, search_range=2, update_factor=0.25,
                      quantization_texture=0, SRLs=2)
    vid = synthetic_video(cfg.pictures, 32, 32, seed=17)
    mesh = pdist.make_gop_mesh(n)
    streams = pdist.encode_gops_distributed(vid, cfg, mesh, reversible=True)
    assert len(streams) == n
    rec = api.expand_gops([api.VideoStream.from_bytes(s) for s in streams])
    assert rec.y.shape == vid.y.shape


def test_scaling_harness_reports_efficiency():
    n = min(len(jax.devices()), 4)
    if n < 2:
        pytest.skip("needs >= 2 devices")
    r = pdist.measure_scaling(n, reps=1)
    assert r["fps_1"] > 0 and r["fps_n"] > 0
    assert 0.0 < r["efficiency"]
