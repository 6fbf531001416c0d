"""Decoder robustness on malformed input — the reference is
recovery-friendly by design (SURVEY.md §5): self-delimiting packets,
metadata re-emitted at GOP starts, in-stream guards for truncated planes
(reference hzcc.c:337-339, dsv_decoder.c:398-401) and a driver that just
stops at a short read (dsv_main.c:567-612). Our decoder must never
crash on truncation or byte corruption, and must skip pictures that
arrive before metadata (dsv_decoder.c:327-331)."""

import numpy as np
import pytest

from dsv1_tpu.constants import (RATE_CONTROL_CRF, SUBSAMP_420,
                                quality_percent)
from dsv1_tpu.models.decoder import Decoder
from dsv1_tpu.models.encoder import EncoderConfig
from dsv1_tpu.models.metadata import Metadata
from dsv1_tpu.models.bitstream import iter_packets
from dsv1_tpu.ops.frame import np_yuv_split
from dsv1_tpu.parallel import encode_stream_gops
from dsv1_tpu.utils.yuv import frame_size

from . import corpus

W, H, G, N = 176, 144, 4, 8


@pytest.fixture(scope="module")
def stream():
    yuv = corpus.make_clip(W, H, SUBSAMP_420, N, seed=13)
    fsz = frame_size(W, H, SUBSAMP_420)
    frames = [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                         np.uint8), SUBSAMP_420, W, H)
              for i in range(N)]
    meta = Metadata(W, H, SUBSAMP_420)
    cfg = EncoderConfig(quality=quality_percent(85), gop=G,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=G - 1)
    return encode_stream_gops(frames, meta, cfg)


def _ndecoded(data: bytes) -> int:
    dec = Decoder()
    return sum(1 for _ in dec.decode_stream(data))


def test_full_stream_decodes(stream):
    assert _ndecoded(stream) == N


@pytest.mark.parametrize("frac", [0.15, 0.5, 0.9])
def test_truncated_stream_no_crash(stream, frac):
    """A short read mid-stream decodes every complete frame before the
    cut and never raises (the reference driver stops at short reads)."""
    cut = stream[:int(len(stream) * frac)]
    n = _ndecoded(cut)
    assert 0 <= n <= N


def test_truncated_inside_header_no_crash(stream):
    # cut inside the very first packet header
    assert _ndecoded(stream[:7]) == 0


def test_truncated_inside_metadata_terminates(stream):
    """A cut inside the metadata packet's UEG fields must terminate:
    past the end the bit reader yields zeros forever, so get_ueg needs
    the corrupt-stream backstop (regression: infinite loop)."""
    for cut in (15, 17, 20, 25):
        assert _ndecoded(stream[:cut]) == 0


def test_picture_before_metadata_skipped(stream):
    """Pictures arriving before any metadata packet are skipped
    (dsv_decoder.c:327-331)."""
    pkts = list(iter_packets(stream))
    # drop the leading metadata packet; keep everything else
    body = b"".join(p for t, p in pkts[1:2])  # first picture alone
    assert _ndecoded(body) == 0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_corrupt_payload_no_crash(stream, seed):
    """Flipping bytes in packet payloads (past the links) must never
    raise out of decode_stream; frames may be lost or wrong, only."""
    rng = np.random.default_rng(seed)
    buf = bytearray(stream)
    # corrupt only payload bytes (offset >= 64 into the stream, away
    # from the first header/links so the walk itself stays valid)
    idx = rng.integers(64, len(buf), 40)
    for i in idx:
        buf[int(i)] ^= int(rng.integers(1, 256))
    n = _ndecoded(bytes(buf))
    assert 0 <= n <= N


def test_garbage_input_no_crash():
    rng = np.random.default_rng(7)
    junk = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    assert _ndecoded(junk) == 0


@pytest.mark.parametrize("frac", [0.5, 0.9])
def test_parallel_decode_truncated_no_crash(stream, frac):
    """The GOP-parallel decode path (the CLI default) tolerates short
    reads too."""
    from dsv1_tpu.parallel import decode_stream_gops
    cut = stream[:int(len(stream) * frac)]
    meta, frames = decode_stream_gops(cut)
    assert 0 <= len(frames) <= N


def test_parallel_decode_corrupt_no_crash(stream):
    rng = np.random.default_rng(3)
    from dsv1_tpu.parallel import decode_stream_gops
    buf = bytearray(stream)
    for i in rng.integers(64, len(buf), 40):
        buf[int(i)] ^= int(rng.integers(1, 256))
    meta, frames = decode_stream_gops(bytes(buf))
    assert 0 <= len(frames) <= N
