"""Exact in-scan ABR (parallel/gop.py _encode_abr_exact): the device
scan runs the reference's per-frame rate law on device-computed packet
lengths and must be BYTE-IDENTICAL to the sequential per-frame ABR
encoder (models/encoder.py) — across chunk boundaries, scene cuts and
forced-intra promotions. DSV1_CHECK_PICLEN additionally asserts every
device pic_len against the packed bytes."""

import numpy as np
import pytest

from dsv1_tpu.constants import (RATE_CONTROL_ABR, SUBSAMP_420,
                                quality_percent)
from dsv1_tpu.models.encoder import Encoder, EncoderConfig
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.parallel import encode_stream_gops

from . import corpus

W, H = 96, 80


def _cfg(g, kbps=300, **kw):
    kw.setdefault("stable_refresh", max(g - 1, 1))
    return EncoderConfig(quality=min(quality_percent(85) * 3 // 2, 2047),
                         gop=g, rc_mode=RATE_CONTROL_ABR,
                         bitrate=kbps * 1024,
                         max_quality=quality_percent(100), **kw)


def _seq(frames, meta, cfg):
    enc = Encoder(meta, cfg)
    enc.start()
    return enc.encode_stream(frames)


@pytest.mark.smoke
def test_exact_abr_byte_identical(monkeypatch):
    """Multi-chunk run (chunk = 4 gops of 4 -> 16 frames; 40 frames =
    2.5 chunks) with carry threading and a padded tail."""
    monkeypatch.setenv("DSV1_CHECK_PICLEN", "1")
    frames = corpus.make_clip_frames(W, H, SUBSAMP_420, 40, seed=5)
    meta = Metadata(W, H, SUBSAMP_420)
    cfg = _cfg(4)
    assert encode_stream_gops(frames, meta, cfg) == _seq(frames, meta,
                                                         _cfg(4))


def test_exact_abr_scene_cut(monkeypatch):
    """A mid-GOP scene cut forces intra (quality boost branch of the
    law) and suppresses the refresh increment."""
    monkeypatch.setenv("DSV1_CHECK_PICLEN", "1")
    frames = corpus.make_clip_frames(W, H, SUBSAMP_420, 24, seed=9,
                                     cut_at=6)
    meta = Metadata(W, H, SUBSAMP_420)
    assert (encode_stream_gops(frames, meta, _cfg(8))
            == _seq(frames, meta, _cfg(8)))


def test_exact_abr_nondividing_stabref(monkeypatch):
    monkeypatch.setenv("DSV1_CHECK_PICLEN", "1")
    frames = corpus.make_clip_frames(W, H, SUBSAMP_420, 18, seed=3)
    meta = Metadata(W, H, SUBSAMP_420)
    cfg = _cfg(6, stable_refresh=4)
    assert (encode_stream_gops(frames, meta, cfg)
            == _seq(frames, meta, _cfg(6, stable_refresh=4)))


def test_exact_abr_low_rate_overflow_fallback(monkeypatch):
    """A very low bitrate drives quality down -> dense P planes can
    overflow the sparse compaction caps; the dense redo must stay
    byte-identical (same carry-in)."""
    monkeypatch.setenv("DSV1_CHECK_PICLEN", "1")
    frames = corpus.make_clip_frames(W, H, SUBSAMP_420, 12, seed=7)
    meta = Metadata(W, H, SUBSAMP_420)
    cfg = _cfg(4, kbps=2000)  # high rate -> quality climbs -> dense planes
    assert (encode_stream_gops(frames, meta, cfg)
            == _seq(frames, meta, _cfg(4, kbps=2000)))


def test_exact_abr_gop1(monkeypatch):
    """gop 1: every frame its own GOP; only the I branch of the law."""
    monkeypatch.setenv("DSV1_CHECK_PICLEN", "1")
    frames = corpus.make_clip_frames(W, H, SUBSAMP_420, 9, seed=2)
    meta = Metadata(W, H, SUBSAMP_420)
    assert (encode_stream_gops(frames, meta, _cfg(1))
            == _seq(frames, meta, _cfg(1)))
