"""Checkpoint/resume: an encode interrupted mid-stream and resumed in a
fresh Encoder must produce a byte-identical stream (SURVEY.md §5)."""

import pickle

import numpy as np

from dsv1_tpu.constants import (RATE_CONTROL_ABR, RATE_CONTROL_CRF,
                                SUBSAMP_420, quality_percent)
from dsv1_tpu.models.encoder import Encoder, EncoderConfig
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.ops.frame import np_yuv_split
from dsv1_tpu.utils.yuv import frame_size

from . import corpus


def _frames(w, h, subsamp, n, seed):
    yuv = corpus.make_clip(w, h, subsamp, n, seed=seed)
    fsz = frame_size(w, h, subsamp)
    return [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz], np.uint8),
                         subsamp, w, h) for i in range(n)]


def _cfg(rc):
    return EncoderConfig(quality=quality_percent(75), gop=5,
                         rc_mode=rc, bitrate=400 * 1024, stable_refresh=4)


def test_resume_matches_uninterrupted():
    w, h, subsamp, n, cut = 96, 80, SUBSAMP_420, 12, 7
    frames = _frames(w, h, subsamp, n, seed=31)
    meta = Metadata(w, h, subsamp)
    for rc in (RATE_CONTROL_CRF, RATE_CONTROL_ABR):
        enc = Encoder(meta, _cfg(rc))
        enc.start()
        golden = enc.encode_stream(frames)

        enc1 = Encoder(meta, _cfg(rc))
        enc1.start()
        out = bytearray()
        for f in frames[:cut]:
            for pkt in enc1.encode(f):
                out += pkt
        blob = pickle.dumps(enc1.state_dict())  # ship across hosts

        enc2 = Encoder(meta, _cfg(rc))
        enc2.start()
        enc2.load_state_dict(pickle.loads(blob))
        for f in frames[cut:]:
            for pkt in enc2.encode(f):
                out += pkt
        out += enc2.end_of_stream()
        assert bytes(out) == golden
