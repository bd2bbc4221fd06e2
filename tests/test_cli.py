"""CLI end-to-end: the streaming compress path (bounded memory, per-GOP
container, resume), expand, info, transcode, rd — driven through
``cli.main`` the way a user runs ``qsvc ...``."""

import os

import numpy as np
import pytest

from qsvc_tpu import cli
from qsvc_tpu.codec import codestream
from qsvc_tpu.io import synthetic_video
from qsvc_tpu.io.yuv import read_yuv, write_yuv, video_psnr


# update_factor 0 so --lossless round trips are bit-exact (the update
# step's [0,255] clamp makes uf>0 only near-lossless; see test_pipeline)
ARGS = ["--pixels_in_x", "64", "--pixels_in_y", "48", "--TRLs", "3",
        "--SRLs", "3", "--block_size", "16", "--search_range", "2",
        "--update_factor", "0"]


@pytest.fixture(scope="module")
def yuv_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    vid = synthetic_video(13, 48, 64, seed=23, kind="translate",
                          velocity=(1.0, 1.0))
    p = str(d / "in.yuv")
    write_yuv(p, vid)
    return p, vid


def test_streaming_compress_expand(tmp_path, yuv_file, capsys):
    src, vid = yuv_file
    out = str(tmp_path / "a.qsvc")
    rec_p = str(tmp_path / "rec.yuv")
    # 13 frames, gop_size 4 -> 3 GOPs, streaming container
    assert cli.main(["compress", "--input", src, "--output", out,
                     "--pictures", "13", "--lossless"] + ARGS) == 0
    with open(out, "rb") as f:
        data = f.read()
    assert codestream.is_gop_container(data)
    assert len(codestream.unpack_gop_streams(data)) == 3
    assert cli.main(["expand", "--input", out, "--output", rec_p]) == 0
    rec = read_yuv(rec_p, 64, 48)
    assert rec.frames == 13
    np.testing.assert_array_equal(rec.y, vid.y)
    np.testing.assert_array_equal(rec.u, vid.u)


def test_arbitrary_frame_count_cli(tmp_path, yuv_file):
    src, vid = yuv_file
    out = str(tmp_path / "b.qsvc")
    rec_p = str(tmp_path / "rec.yuv")
    # 11 frames: not k*gop_size+1 -- tail GOP padded, decode crops
    assert cli.main(["compress", "--input", src, "--output", out,
                     "--pictures", "11", "--lossless"] + ARGS) == 0
    assert cli.main(["expand", "--input", out, "--output", rec_p]) == 0
    rec = read_yuv(rec_p, 64, 48)
    assert rec.frames == 11
    np.testing.assert_array_equal(rec.y, vid.y[:11])


def test_resume_cli(tmp_path, yuv_file, capsys):
    src, vid = yuv_file
    out = str(tmp_path / "c.qsvc")
    store = str(tmp_path / "ckpt")
    args = ["compress", "--input", src, "--output", out,
            "--pictures", "13", "--lossless", "--resume", store] + ARGS
    assert cli.main(args) == 0
    capsys.readouterr()
    # second run: every GOP must come from the checkpoint store
    assert cli.main(args) == 0
    err = capsys.readouterr().err
    assert err.count("(cached)") == 3
    # the stream written from cache decodes identically
    rec_p = str(tmp_path / "rec.yuv")
    assert cli.main(["expand", "--input", out, "--output", rec_p]) == 0
    np.testing.assert_array_equal(read_yuv(rec_p, 64, 48).y, vid.y)


def test_info_transcode_rd_on_container(tmp_path, yuv_file, capsys):
    src, vid = yuv_file
    out = str(tmp_path / "d.qsvc")
    assert cli.main(["compress", "--input", src, "--output", out,
                     "--pictures", "13", "--quantization_texture",
                     "43000"] + ARGS) == 0
    capsys.readouterr()
    assert cli.main(["info", "--input", out]) == 0
    txt = capsys.readouterr().out
    assert "GOP 2" in txt and "total" in txt

    tout = str(tmp_path / "t.qsvc")
    assert cli.main(["transcode", "--input", out, "--output", tout,
                     "--quantization", "45000"]) == 0
    assert os.path.getsize(tout) < os.path.getsize(out)
    rec_p = str(tmp_path / "rec.yuv")
    assert cli.main(["expand", "--input", tout, "--output", rec_p]) == 0
    rec = read_yuv(rec_p, 64, 48)
    assert rec.frames == 13

    capsys.readouterr()
    assert cli.main(["rd", "--input", out, "--original", src,
                     "--quantizations", "44000,45000"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l and not l.startswith("#")]
    assert len(lines) == 2
