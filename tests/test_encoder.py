"""Golden tests: our encoder must produce byte-identical .dsv streams to the
reference encoder for matched settings (the strongest possible parity)."""

import numpy as np
import pytest

from dsv1_tpu.constants import (RATE_CONTROL_ABR, RATE_CONTROL_CRF,
                                SUBSAMP_420, SUBSAMP_444, quality_percent)
from dsv1_tpu.models.encoder import Encoder, EncoderConfig
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.utils.yuv import frame_size

from . import corpus


def _encode_ours(yuv, w, h, subsamp, nframes, cfg):
    meta = Metadata(w, h, subsamp)
    enc = Encoder(meta, cfg)
    enc.start()
    fsz = frame_size(w, h, subsamp)
    frames = []
    from dsv1_tpu.ops.frame import np_yuv_split
    for i in range(nframes):
        a = np.frombuffer(yuv[i * fsz:(i + 1) * fsz], np.uint8)
        frames.append(np_yuv_split(a, subsamp, w, h))
    return enc.encode_stream(frames)


def _compare(tmp_path, w, h, subsamp, nframes, cfg, **cli):
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=w * h)
    ref = corpus.ref_encode(yuv, w, h, subsamp, nframes, tmp_path, **cli)
    ours = _encode_ours(yuv, w, h, subsamp, nframes, cfg)
    assert len(ours) == len(ref), (len(ours), len(ref))
    a = np.frombuffer(ref, np.uint8)
    b = np.frombuffer(ours, np.uint8)
    diffs = np.flatnonzero(a != b)
    assert diffs.size == 0, f"first byte diff at {diffs[:8]} of {len(ref)}"


def test_force_metadata_midstream(tmp_path):
    """Encoder.force_metadata (dsv_enc_force_metadata, dsv_encoder.h:115):
    a mid-stream force re-emits metadata, restarts the GOP, and the
    stream round-trips through both our decoder and the reference
    binary."""
    w, h, subsamp, nframes, gop = 96, 80, SUBSAMP_420, 8, 12
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=21)
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(70), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    enc = Encoder(meta, cfg)
    enc.start()
    fsz = frame_size(w, h, subsamp)
    from dsv1_tpu.ops.frame import np_yuv_split
    stream = bytearray()
    n_meta = 0
    for i in range(nframes):
        if i == 4:
            enc.force_metadata()  # mid-GOP: frame 4 must restart the GOP
        a = np.frombuffer(yuv[i * fsz:(i + 1) * fsz], np.uint8)
        pkts = enc.encode(np_yuv_split(a, subsamp, w, h))
        if i in (0, 4):
            assert len(pkts) == 2, "forced frame must carry metadata"
            n_meta += 1
        for p in pkts:
            stream += p
    stream += enc.end_of_stream()
    assert n_meta == 2

    # round-trips bit-exactly through our decoder and the reference's
    from dsv1_tpu.models.decoder import Decoder
    dec = Decoder()
    ours = b"".join(np.asarray(p).tobytes()
                    for _, planes in dec.decode_stream(bytes(stream))
                    for p in planes)
    ref = corpus.ref_decode(bytes(stream), tmp_path)
    assert ours == ref
    assert len(ref) == nframes * fsz


def test_encoder_intra_only_crf(tmp_path):
    cfg = EncoderConfig(quality=quality_percent(70), gop=0,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=1)
    _compare(tmp_path, 96, 80, SUBSAMP_420, 4, cfg,
             gop=0, qp=70, rc_mode=1, stabref=1)


def test_encoder_gop_crf(tmp_path):
    cfg = EncoderConfig(quality=quality_percent(70), gop=6,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=5)
    _compare(tmp_path, 96, 80, SUBSAMP_420, 8, cfg,
             gop=6, qp=70, rc_mode=1, stabref=5)


def test_encoder_abr(tmp_path):
    cfg = EncoderConfig(quality=quality_percent(80) * 3 // 2, gop=6,
                        rc_mode=RATE_CONTROL_ABR, bitrate=300 * 1024,
                        stable_refresh=5,
                        max_quality=quality_percent(100))
    # the CLI pre-boosts requested quality by 3/2 in ABR (dsv_main.c:476-478)
    _compare(tmp_path, 96, 80, SUBSAMP_420, 10, cfg,
             gop=6, qp=80, rc_mode=0, kbps=300, stabref=5)


def test_encoder_444_scd(tmp_path):
    cfg = EncoderConfig(quality=quality_percent(75), gop=8,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=7,
                        scene_change_delta=2)
    _compare(tmp_path, 64, 64, SUBSAMP_444, 8, cfg,
             gop=8, qp=75, rc_mode=1, stabref=7, schdelta=2)


def test_encoder_odd_dims_crf(tmp_path):
    """Odd frame dims (106x90: chroma 53x45 rounds to even 54x46 coef
    dims) must stay byte-identical through the edge-replication paths."""
    cfg = EncoderConfig(quality=quality_percent(60), gop=4,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=3)
    _compare(tmp_path, 106, 90, SUBSAMP_420, 5, cfg,
             gop=4, qp=60, rc_mode=1, stabref=3)
