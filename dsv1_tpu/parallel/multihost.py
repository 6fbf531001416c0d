"""Multi-host GOP-sharded encode (SURVEY.md §5, BASELINE config 5).

Closed GOPs with per-GOP metadata re-emit (reference dsv_encoder.c:624-652)
make GOP ranges fully independent under CRF: each host encodes a contiguous
slice of GOPs against only its own frames, and the only cross-host state is
the packet prev-link of the shard boundary picture (dsv_encoder.c:170-192)
— an O(1) patch per boundary at mux time. The muxed stream is byte-identical
to a single-host encode of the whole sequence (tested).

Usage (one process per host):

    jax.distributed.initialize(...)           # standard JAX multi-process
    shard = encode_shard(my_frames, meta, cfg,
                         first_gop=my_first_gop, total_frames=N)
    # gather EncodedShard parts on host 0 (any transport), then:
    stream = mux_shards(parts, meta)

`shard_ranges` splits a sequence into per-host GOP ranges;
`encode_stream_multihost` runs the whole flow in one process (test/driver
convenience — the per-shard encodes are what each host would run).
"""

from dataclasses import dataclass

from ..constants import GOP_INTRA, RATE_CONTROL_CRF, div_round
from ..models.bitstream import encode_eos_packet
from ..models.encoder import EncoderConfig
from ..models.metadata import Metadata
from .gop import encode_stream_gops

# byte offset of the prev-link field in a packet header (B.1)
_PREV_OFF = 6


@dataclass
class EncodedShard:
    """One host's partial stream: its GOP range's packets, no EOS."""
    data: bytes
    last_pic_len: int   # prev-link seed for the next shard's first picture
    first_gop: int


def shard_ranges(n_frames: int, gop: int, n_shards: int):
    """Split n_frames into n_shards contiguous GOP ranges.

    Returns [(first_gop, first_frame, n_frames_in_shard)] — empty shards
    (more hosts than GOPs) get zero frames.
    """
    G = max(gop, 1) if gop != GOP_INTRA else 1
    ngops = div_round(n_frames, G)
    per = div_round(ngops, n_shards)
    out = []
    for s in range(n_shards):
        g0 = min(s * per, ngops)
        g1 = min(g0 + per, ngops)
        f0 = g0 * G
        f1 = min(g1 * G, n_frames)
        out.append((g0, f0, max(f1 - f0, 0)))
    return out


def encode_shard(frames, meta: Metadata, cfg: EncoderConfig,
                 first_gop: int, mesh=None,
                 gops_per_device: int = 0) -> EncodedShard:
    """Encode one host's GOP slice. frames must start at a GOP boundary
    (frame number first_gop * cfg.gop). CRF only, like the GOP-parallel
    path it wraps."""
    if cfg.rc_mode != RATE_CONTROL_CRF:
        raise ValueError("multi-host GOP sharding requires CRF")
    G = max(cfg.gop, 1) if cfg.gop != GOP_INTRA else 1
    data, last = encode_stream_gops(
        frames, meta, cfg, mesh=mesh, gops_per_device=gops_per_device,
        _fnum_base=first_gop * G, _emit_eos=False, _return_state=True)
    return EncodedShard(data=data, last_pic_len=last, first_gop=first_gop)


def _patch_first_prev(data: bytearray, meta_len: int, prev_link: int):
    """Patch the prev-link of the shard's first picture packet (it sits
    right after the leading metadata packet)."""
    off = meta_len + _PREV_OFF
    if len(data) >= off + 4:
        data[off:off + 4] = prev_link.to_bytes(4, "big")


def mux_shards(parts, meta: Metadata) -> bytes:
    """Concatenate per-host partial streams into one .dsv stream:
    boundary prev-link patches + final EOS packet."""
    from ..models.bitstream import encode_metadata_packet

    parts = sorted((p for p in parts if p.data), key=lambda p: p.first_gop)
    meta_len = len(encode_metadata_packet(meta))
    out = bytearray()
    prev = 0
    for p in parts:
        d = bytearray(p.data)
        _patch_first_prev(d, meta_len, prev)
        out += d
        prev = p.last_pic_len
    out += encode_eos_packet(prev)
    return bytes(out)


def encode_stream_multihost(frames, meta: Metadata,
                            cfg: EncoderConfig | None = None,
                            n_shards: int = 2, mesh=None) -> bytes:
    """Single-process driver for the multi-host flow: encode each shard's
    GOP range independently (exactly what each host would run), then mux.
    Byte-identical to encode_stream_gops over the whole sequence."""
    cfg = cfg or EncoderConfig()
    frames = list(frames)
    parts = []
    for g0, f0, nf in shard_ranges(len(frames), cfg.gop, n_shards):
        if nf == 0:
            continue
        parts.append(encode_shard(frames[f0:f0 + nf], meta, cfg,
                                  first_gop=g0, mesh=mesh))
    return mux_shards(parts, meta)
