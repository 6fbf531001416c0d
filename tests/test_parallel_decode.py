"""GOP-parallel decode: must be bit-exact against the reference decoder
for reference-encoded streams, and match the sequential decoder."""

import jax
import numpy as np
import pytest

from dsv1_tpu.constants import SUBSAMP_420, SUBSAMP_422
from dsv1_tpu.models.decoder import Decoder
from dsv1_tpu.parallel import decode_stream_gops
from dsv1_tpu.parallel.gop import gop_mesh
from dsv1_tpu.utils.yuv import frame_size

from . import corpus


def _planar(planes):
    return b"".join(np.asarray(p).tobytes() for p in planes)


@pytest.mark.parametrize("subsamp,gop", [(SUBSAMP_420, 4), (SUBSAMP_422, 0)])
def test_parallel_decode_bit_exact(tmp_path, subsamp, gop):
    w, h, nframes = 96, 80, 9
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=21)
    stream = corpus.ref_encode(yuv, w, h, subsamp, nframes, tmp_path,
                               gop=gop, qp=70)
    golden = corpus.ref_decode(stream, tmp_path)
    meta, frames = decode_stream_gops(stream)
    assert len(frames) == nframes
    out = b"".join(_planar(planes)
                   for _, planes in sorted(frames, key=lambda t: t[0]))
    assert out == golden


def test_parallel_decode_matches_sequential(tmp_path):
    w, h, subsamp, nframes = 96, 80, SUBSAMP_420, 10
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=22)
    stream = corpus.ref_encode(yuv, w, h, subsamp, nframes, tmp_path,
                               gop=5, qp=80)
    seq = Decoder()
    seq_out = [(fno, _planar(p)) for fno, p in seq.decode_stream(stream)]
    _, frames = decode_stream_gops(stream)
    par_out = [(fno, _planar(p)) for fno, p in frames]
    assert par_out == seq_out


def test_parallel_decode_sharded(tmp_path):
    w, h, subsamp, nframes = 96, 80, SUBSAMP_420, 12
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=23)
    stream = corpus.ref_encode(yuv, w, h, subsamp, nframes, tmp_path,
                               gop=3, qp=75)
    golden = corpus.ref_decode(stream, tmp_path)
    mesh = gop_mesh(jax.devices())
    _, frames = decode_stream_gops(stream, mesh=mesh)
    out = b"".join(_planar(p)
                   for _, p in sorted(frames, key=lambda t: t[0]))
    assert out == golden
