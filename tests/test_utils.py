"""Tracing run-log and checkpoint/resume artifact store (SURVEY §5)."""

import json
import time

import numpy as np
import pytest

from qsvc_tpu import api
from qsvc_tpu.config import CodecConfig
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.utils import RunLog, set_run_log, stage
from qsvc_tpu.utils.artifacts import (ArtifactStore,
                                      compress_gops_resumable, gop_key)


def test_runlog_collects_and_mirrors(tmp_path):
    path = tmp_path / "trace.jsonl"
    log = RunLog(path=str(path))
    prev = set_run_log(log)
    try:
        with stage("analyze", gop=0):
            time.sleep(0.01)
        with stage("analyze", gop=1):
            time.sleep(0.01)
        with stage("entropy"):
            pass
    finally:
        set_run_log(prev)
    assert len(log.records) == 3
    assert log.total("analyze") >= 0.02
    assert set(log.summary()) == {"analyze", "entropy"}
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["stage"] == "analyze" and lines[0]["gop"] == 0


def test_stage_noop_without_log():
    with stage("whatever"):
        pass


@pytest.fixture(scope="module")
def small():
    cfg = CodecConfig(pixels_in_x=32, pixels_in_y=32, TRLs=2, GOPs=3,
                      block_size=16, search_range=2, update_factor=0.0,
                      quantization_texture=0, SRLs=2)
    vid = synthetic_video(cfg.pictures, 32, 32, seed=19)
    return cfg, vid


def test_resume_skips_cached_gops(tmp_path, small, monkeypatch):
    cfg, vid = small
    store = ArtifactStore(str(tmp_path / "cache"))
    streams1 = compress_gops_resumable(vid, cfg, store, reversible=True)
    assert len(streams1) == 3

    # second run must not call the encoder at all (the pipelined path
    # enters via compress_dispatch)
    calls = []
    real = api.compress_dispatch

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(api, "compress_dispatch", counting)
    streams2 = compress_gops_resumable(vid, cfg, store, reversible=True)
    assert calls == []
    assert streams2 == streams1

    # editing one GOP's frames re-encodes exactly that GOP
    vid2 = synthetic_video(cfg.pictures, 32, 32, seed=19)
    # mild edit (stays inside the +-128 residue clip) in GOP 1 only
    vid2.y[cfg.gop_size + 1] = np.clip(
        vid2.y[cfg.gop_size + 1].astype(np.int32) + 8, 0, 255
    ).astype(np.uint8)
    streams3 = compress_gops_resumable(vid2, cfg, store, reversible=True)
    assert len(calls) == 1
    assert streams3[0] == streams1[0] and streams3[2] == streams1[2]
    assert streams3[1] != streams1[1]

    # decodes end to end
    rec = api.expand_gops([api.VideoStream.from_bytes(s) for s in streams3])
    np.testing.assert_array_equal(rec.y, vid2.y)


def test_gop_key_sensitive_to_params(small):
    cfg, vid = small
    chunk = vid[:cfg.gop_size + 1]
    k1 = gop_key(chunk, cfg, True)
    assert gop_key(chunk, cfg, False) != k1
    assert gop_key(chunk, cfg.replace(search_range=4), True) != k1
    assert gop_key(chunk, cfg, True) == k1
