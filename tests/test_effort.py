"""Beyond-reference motion search (EncoderConfig.effort).

The bitstream does not encode how MVs were found, so effort > 0 streams
must stay spec-valid (reference-decodable) while strictly improving RD:
the exhaustive window includes the reference's 9-point result, so chosen
SADs can only decrease. Both encode paths (sequential per-frame and
GOP-parallel device scan) share ops/hme.py and must agree byte-for-byte.
"""

import numpy as np

from dsv1_tpu.constants import RATE_CONTROL_CRF, SUBSAMP_420, quality_percent
from dsv1_tpu.models.encoder import Encoder, EncoderConfig
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.ops.frame import np_yuv_split
from dsv1_tpu.parallel import encode_stream_gops
from dsv1_tpu.utils.yuv import frame_size

from . import corpus

W, H, SS, G, NF = 96, 80, SUBSAMP_420, 4, 12


def _setup():
    yuv = corpus.make_clip(W, H, SS, NF, seed=31)
    fsz = frame_size(W, H, SS)
    frames = [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                         np.uint8), SS, W, H)
              for i in range(NF)]
    return yuv, frames, Metadata(W, H, SS)


def _cfg(effort):
    return EncoderConfig(quality=quality_percent(70), gop=G,
                         rc_mode=RATE_CONTROL_CRF, stable_refresh=G - 1,
                         effort=effort)


def _psnr(dec: bytes, src: bytes) -> float:
    a = np.frombuffer(dec, np.uint8).astype(np.float64)
    b = np.frombuffer(src, np.uint8).astype(np.float64)
    return 10 * np.log10(255.0 ** 2 / np.mean((a - b) ** 2))


def test_effort_improves_rd_and_stays_spec_valid(tmp_path):
    yuv, frames, meta = _setup()
    s0 = encode_stream_gops(frames, meta, _cfg(0))
    s2 = encode_stream_gops(frames, meta, _cfg(2))
    assert s2 != s0
    # the reference decoder must accept the wider-search stream
    d0 = corpus.ref_decode(s0, tmp_path)
    d2 = corpus.ref_decode(s2, tmp_path)
    assert len(d2) == len(yuv)
    # strictly better rate AND no quality loss on the motion corpus
    assert len(s2) <= len(s0)
    assert _psnr(d2, yuv) >= _psnr(d0, yuv) - 1e-9


def test_effort_sequential_matches_gop_parallel():
    _, frames, meta = _setup()
    enc = Encoder(meta, _cfg(2))
    enc.start()
    seq = enc.encode_stream(frames)
    par = encode_stream_gops(frames, meta, _cfg(2))
    assert par == seq


def test_effort_abr_reference_decodable(tmp_path):
    """ABR feedback consumes the (smaller) effort frames; the stream must
    stay spec-valid through the rate-control loop."""
    from dsv1_tpu.constants import RATE_CONTROL_ABR
    yuv, frames, meta = _setup()
    cfg = EncoderConfig(quality=quality_percent(85), gop=G,
                        rc_mode=RATE_CONTROL_ABR, bitrate=400 * 1024,
                        stable_refresh=G - 1, effort=1)
    enc = Encoder(meta, cfg)
    enc.start()
    stream = enc.encode_stream(frames)
    dec = corpus.ref_decode(stream, tmp_path)
    assert len(dec) == len(yuv)
