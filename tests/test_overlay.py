"""Decoder debug overlays (-drawinfo): bit-exact vs the reference
decoder's rendering (dsv_decoder.c:147-243) for every flag combination
(1=stability HQ, 2=motion vectors, 4=intra blocks)."""

import subprocess

import pytest

from dsv1_tpu import cli
from dsv1_tpu.constants import SUBSAMP_420

from . import corpus, oracle

W, H, N = 96, 64, 8


@pytest.fixture(scope="module")
def encoded(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("drawinfo")
    yuv = corpus.make_clip(W, H, SUBSAMP_420, N, seed=5)
    (tmp / "in.yuv").write_bytes(yuv)
    oracle.build_oracle()
    subprocess.run(
        [str(oracle.BIN), "e", f"-inp_{tmp/'in.yuv'}",
         f"-out_{tmp/'a.dsv'}", f"-w{W}", f"-h{H}", "-fmt2", f"-nfr{N}",
         "-gop4", "-qp85", "-y"], check=True, capture_output=True)
    return tmp


@pytest.mark.parametrize("flags", [1, 2, 4, 7])
def test_drawinfo_matches_reference(encoded, flags):
    ref = encoded / f"ref{flags}.yuv"
    our = encoded / f"our{flags}.yuv"
    subprocess.run(
        [str(oracle.BIN), "d", f"-inp_{encoded/'a.dsv'}", f"-out_{ref}",
         f"-drawinfo{flags}", "-y"], check=True, capture_output=True)
    assert cli.decode_main([f"-inp_{encoded/'a.dsv'}", f"-out_{our}",
                            f"-drawinfo{flags}", "-y"]) == 0
    assert our.read_bytes() == ref.read_bytes()
