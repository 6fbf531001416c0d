"""CLI end-to-end: byte-identical streams/output vs the reference CLI at
default settings (gop12, ABR, auto bitrate, SCD)."""

import os
import subprocess
import sys

import numpy as np

from . import corpus, oracle


def _run_ours(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-m", "dsv1_tpu.cli", *args],
                       capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]


def test_cli_default_settings_byte_identical(tmp_path):
    oracle.build_oracle()
    w, h, n = 96, 80, 8
    yuv = corpus.make_clip(w, h, 0x5, n, seed=42)
    (tmp_path / "in.yuv").write_bytes(yuv)
    common = [f"-inp_{tmp_path}/in.yuv", f"-w{w}", f"-h{h}", f"-nfr{n}", "-y"]
    subprocess.run([str(oracle.BIN), "e", *common,
                    f"-out_{tmp_path}/ref.dsv"], check=True,
                   capture_output=True)
    _run_ours(["e", *common, f"-out_{tmp_path}/ours.dsv"])
    assert (tmp_path / "ref.dsv").read_bytes() == \
        (tmp_path / "ours.dsv").read_bytes()

    subprocess.run([str(oracle.BIN), "d", f"-inp_{tmp_path}/ref.dsv",
                    f"-out_{tmp_path}/ref.yuv", "-y"], check=True,
                   capture_output=True)
    _run_ours(["d", f"-inp_{tmp_path}/ref.dsv",
               f"-out_{tmp_path}/ours.yuv", "-y"])
    assert (tmp_path / "ref.yuv").read_bytes() == \
        (tmp_path / "ours.yuv").read_bytes()


def test_cli_out420p_matches_reference(tmp_path):
    oracle.build_oracle()
    w, h, n = 64, 64, 4
    yuv = corpus.make_clip(w, h, 0x0, n, seed=9)  # 4:4:4
    (tmp_path / "in.yuv").write_bytes(yuv)
    subprocess.run([str(oracle.BIN), "e", f"-inp_{tmp_path}/in.yuv",
                    f"-out_{tmp_path}/a.dsv", f"-w{w}", f"-h{h}", "-fmt0",
                    f"-nfr{n}", "-gop4", "-y"], check=True,
                   capture_output=True)
    subprocess.run([str(oracle.BIN), "d", f"-inp_{tmp_path}/a.dsv",
                    f"-out_{tmp_path}/ref420.yuv", "-out420p1", "-y"],
                   check=True, capture_output=True)
    _run_ours(["d", f"-inp_{tmp_path}/a.dsv",
               f"-out_{tmp_path}/ours420.yuv", "-out420p1", "-y"])
    assert (tmp_path / "ref420.yuv").read_bytes() == \
        (tmp_path / "ours420.yuv").read_bytes()


def test_cli_gop_inf_matches_reference(tmp_path):
    """DSV_GOP_INF (gop = INT_MAX): one I frame then P forever — must
    fall back to the sequential encoder and stay byte-identical."""
    oracle.build_oracle()
    w, h, n = 64, 48, 6
    yuv = corpus.make_clip(w, h, 0x5, n, seed=3)
    (tmp_path / "in.yuv").write_bytes(yuv)
    common = [f"-inp_{tmp_path}/in.yuv", f"-w{w}", f"-h{h}", f"-nfr{n}",
              "-gop2147483647", "-rc_mode1", "-y"]
    subprocess.run([str(oracle.BIN), "e", *common,
                    f"-out_{tmp_path}/ref.dsv"], check=True,
                   capture_output=True)
    _run_ours(["e", *common, f"-out_{tmp_path}/ours.dsv"])
    assert (tmp_path / "ref.dsv").read_bytes() == \
        (tmp_path / "ours.dsv").read_bytes()


def test_cli_fps_aspect_metadata(tmp_path):
    """Non-default fps/aspect ratios flow into the metadata packet
    byte-identically (dsv_main fps_num/den, aspect_num/den params)."""
    oracle.build_oracle()
    w, h, n = 64, 48, 4
    yuv = corpus.make_clip(w, h, 0x5, n, seed=6)
    (tmp_path / "in.yuv").write_bytes(yuv)
    common = [f"-inp_{tmp_path}/in.yuv", f"-w{w}", f"-h{h}", f"-nfr{n}",
              "-gop2", "-rc_mode1", "-fps_num24000", "-fps_den1001",
              "-aspect_num16", "-aspect_den9", "-y"]
    subprocess.run([str(oracle.BIN), "e", *common,
                    f"-out_{tmp_path}/ref.dsv"], check=True,
                   capture_output=True)
    _run_ours(["e", *common, f"-out_{tmp_path}/ours.dsv"])
    assert (tmp_path / "ref.dsv").read_bytes() == \
        (tmp_path / "ours.dsv").read_bytes()
