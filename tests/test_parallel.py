"""GOP-parallel encode path: must be byte-identical to the sequential
encoder in CRF with stable_refresh = gop-1 (the CLI default pairing,
dsv_main.c:487-489), sharded or not; and always reference-decodable."""

import jax
import numpy as np
import pytest

from dsv1_tpu.constants import (RATE_CONTROL_CRF, SUBSAMP_411, SUBSAMP_420,
                                SUBSAMP_422, quality_percent)
from dsv1_tpu.models.encoder import Encoder, EncoderConfig
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.ops.frame import np_yuv_split
from dsv1_tpu.parallel import encode_stream_gops, gop_mesh
from dsv1_tpu.utils.yuv import frame_size

from . import corpus


def _frames(yuv, w, h, subsamp, nframes):
    fsz = frame_size(w, h, subsamp)
    return [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz], np.uint8),
                         subsamp, w, h) for i in range(nframes)]


def _sequential(frames, meta, cfg):
    enc = Encoder(meta, cfg)
    enc.start()
    return enc.encode_stream(frames)


@pytest.mark.parametrize("subsamp,nframes,gop", [
    (SUBSAMP_420, 10, 4),   # tail GOP of 2
    (SUBSAMP_422, 8, 4),
    (SUBSAMP_411, 8, 4),
])
def test_gop_parallel_matches_sequential(subsamp, nframes, gop):
    w, h = 96, 80
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=7)
    frames = _frames(yuv, w, h, subsamp, nframes)
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(70), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    seq = _sequential(frames, meta, cfg)
    par = encode_stream_gops(frames, meta, cfg)
    assert par == seq


def test_gop_parallel_qp95_wide_cap_matches_sequential():
    """quality 95% (quant 108) is the dense end where P planes used to
    overflow the n/128 sparse cap on most frames (tools/overflow_sweep);
    hzcc.sparse_cap_div now widens the cap there — the stream must stay
    byte-identical and the wide-cap compact path must carry it (no
    reliance on the dense-redo fallback for correctness either way)."""
    w, h, subsamp, nframes, gop = 96, 80, SUBSAMP_420, 8, 4
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=31)
    frames = _frames(yuv, w, h, subsamp, nframes)
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(95), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    seq = _sequential(frames, meta, cfg)
    par = encode_stream_gops(frames, meta, cfg)
    assert par == seq


@pytest.mark.parametrize("gop", [4, 0])
def test_pipeline_knobs_byte_identical(gop, monkeypatch):
    """The perf knobs (prefetch depth, parallel-stream H2D staging,
    per-device GOP batch) must not change a single output byte."""
    w, h, subsamp, nframes = 96, 80, SUBSAMP_420, 10
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=7)
    frames = _frames(yuv, w, h, subsamp, nframes)
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(70), gop=gop,
                        rc_mode=RATE_CONTROL_CRF,
                        stable_refresh=(gop - 1) or 1)
    base = encode_stream_gops(frames, meta, cfg)
    monkeypatch.setenv("DSV1_PREFETCH", "3")
    monkeypatch.setenv("DSV1_H2D_STREAMS", "4")
    monkeypatch.setenv("DSV1_GOPS_PER_DEVICE", "2")
    # lower the per-slice floor so this small clip actually takes the
    # multi-slice flatten/split/concat path (default 256KB floor would
    # collapse the split to n=1 at ~115KB per chunk)
    monkeypatch.setenv("DSV1_H2D_SLICE_FLOOR", str(16 << 10))
    assert encode_stream_gops(frames, meta, cfg) == base


def test_gop_parallel_sharded_matches_sequential():
    w, h, subsamp, nframes, gop = 96, 80, SUBSAMP_420, 10, 4
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=9)
    frames = _frames(yuv, w, h, subsamp, nframes)
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(70), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    seq = _sequential(frames, meta, cfg)
    mesh = gop_mesh(jax.devices())  # 8 virtual CPU devices (conftest)
    par = encode_stream_gops(frames, meta, cfg, mesh=mesh)
    assert par == seq


def test_intra_parallel_matches_sequential():
    w, h, subsamp, nframes = 96, 80, SUBSAMP_420, 5
    yuv = corpus.make_clip(w, h, subsamp, nframes, seed=3)
    frames = _frames(yuv, w, h, subsamp, nframes)
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(70), gop=0,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=1)
    seq = _sequential(frames, meta, cfg)
    par = encode_stream_gops(frames, meta, cfg)
    assert par == seq


def _scene_cut_frames(w, h, nframes, cut_at, seed=5):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(nframes):
        lum = 40 if i < cut_at else 200  # hard cut (forces intra)
        y = np.clip(lum + rng.integers(-20, 20, (h, w)), 0,
                    255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def test_gop_parallel_scene_cut_byte_identical():
    """A mid-GOP forced-intra frame suppresses the refresh-counter
    increment, so the next GOP does NOT start at a stability refresh —
    the stability-chain replay must detect it and re-encode with the
    carried accumulators, restoring byte parity with the sequential
    encoder (previously a documented divergence)."""
    w, h, gop, nframes = 96, 80, 4, 12
    frames = _scene_cut_frames(w, h, nframes, cut_at=5)
    meta = Metadata(w, h, SUBSAMP_420)
    cfg = EncoderConfig(quality=quality_percent(70), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    seq = _sequential(frames, meta, cfg)
    par = encode_stream_gops(frames, meta, cfg)
    assert par == seq


def test_gop_parallel_stabref_not_dividing_byte_identical():
    """stable_refresh < gop-1 with (gop-1) % stable_refresh != 0: every
    GOP boundary lands mid-refresh-window (the reference carries the
    accumulators across), so the replay path re-encodes systematically
    — still byte-identical to the sequential encoder."""
    w, h, gop, nframes = 96, 80, 6, 18
    yuv = corpus.make_clip(w, h, SUBSAMP_420, nframes, seed=13)
    frames = _frames(yuv, w, h, SUBSAMP_420, nframes)
    meta = Metadata(w, h, SUBSAMP_420)
    cfg = EncoderConfig(quality=quality_percent(70), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=4)
    seq = _sequential(frames, meta, cfg)
    par = encode_stream_gops(frames, meta, cfg)
    assert par == seq


def test_gop_parallel_scene_cut_ref_decodable(tmp_path):
    """A hard scene cut mid-GOP forces intra; the parallel stream must
    decode in the reference decoder (spec validity beyond byte parity)."""
    w, h, subsamp, nframes, gop = 96, 80, SUBSAMP_420, 8, 4
    rng = np.random.default_rng(5)
    frames = []
    fsz_c = (w // 2, h // 2)
    for i in range(nframes):
        lum = 40 if i < 5 else 200  # cut at frame 5 (mid-GOP)
        y = np.clip(lum + rng.integers(-20, 20, (h, w)), 0, 255).astype(np.uint8)
        u = np.full((fsz_c[1], fsz_c[0]), 120, np.uint8)
        v = np.full((fsz_c[1], fsz_c[0]), 130, np.uint8)
        frames.append((y, u, v))
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(70), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    par = encode_stream_gops(frames, meta, cfg)
    dec = corpus.ref_decode(par, tmp_path)
    assert len(dec) == nframes * frame_size(w, h, subsamp)
