"""Exact on-device picture-packet byte lengths.

The ABR rate-control law (quality2quant, reference dsv_encoder.c:70-168)
feeds on the byte size of the previously packed picture
(dsv_encoder.c:816-848) — the one datum that normally forces a device ->
host -> device round trip per frame. But the wire format is
deterministic and every component's bit length has a closed form
(interleaved exp-Golomb: len(UEG(v)) = 2*floor(log2(v+1))+1, reference
bs.c:128-157), so a picture's packed size is computable on device from
the same tensors the encode core already produces: quantized traversal
values, stability flags, motion fields, DCs. That closes the rate
feedback loop inside a `lax.scan` — per-frame ABR with zero host round
trips (parallel/gop.py's ABR path).

The packers (models/bitstream.py + native/dsvbits.cpp pack_picture /
pack_chunk) remain the single source of truth for bytes; this module
mirrors only their *lengths* and is property-tested against the real
packer in tests/test_piclen.py. Wire layout being mirrored:
  header        fourcc+ver+type 6B, prev/next links 8B, fnum 4B
                (encode_packet_hdr, dsv_encoder.c:410-461)
  block dims    UEG(w/4) UEG(h/4), byte-aligned (dsv_encoder.c:495-504)
  stability     UEG(len) aligned + ZBRLE bytes (dsv_encoder.c:329-408)
  motion (P)    4 x [UEG(len) aligned + bytes] (dsv_encoder.c:256-327)
  quant         qp_bits bits, alignment absorbed by the plane section
  plane x3      4B len + SEG(dc) aligned + 4B nruns aligned +
                run/value symbols aligned + 1B EOP (hzcc.c:449-496)
"""

import jax.numpy as jnp
from jax import lax

from ..constants import MODE_INTER


def _i32(x):
    return jnp.asarray(x, jnp.int32)


def ueg_len(v):
    """Bit length of UEG(v) = 2*floor(log2(v+1)) + 1 (bs.c:128-157).
    v >= 0, elementwise int32."""
    vp = _i32(v) + 1
    k = 31 - lax.clz(vp)
    return 2 * k + 1


def seg_len(v):
    """Bit length of SEG(v): UEG(|v|) plus a sign bit when v != 0
    (bs.c:159-188)."""
    a = jnp.abs(_i32(v))
    return ueg_len(a) + (a != 0).astype(jnp.int32)


def neg_len(v):
    """Bit length of NEG(v): UEG(|v|-1) plus a sign bit; v != 0
    (bs.c:190-219)."""
    return ueg_len(jnp.abs(_i32(v)) - 1) + 1


def _ceil8(bits):
    return (bits + 7) >> 3 if isinstance(bits, int) else (_i32(bits) + 7) >> 3


def _prev_one_excl(ones, idx):
    """Index of the previous set position strictly before each element
    (-1 if none): exclusive running max of idx over the mask."""
    marked = jnp.where(ones, idx, -1)
    inc = lax.cummax(marked)
    return jnp.concatenate([jnp.full((1,), -1, jnp.int32), inc[:-1]])


def zbrle_bytes(ones):
    """Byte length of the ZBRLE substream for a flag vector: one UEG per
    set flag coding the zero-run before it, plus the trailing run
    (bs.c:221-267 / encoder loop in native/dsvbits.cpp put_ueg per set
    bit + trailing)."""
    ones = jnp.asarray(ones).astype(bool).reshape(-1)
    n = ones.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    prev = _prev_one_excl(ones, idx)
    bits = jnp.sum(jnp.where(ones, ueg_len(idx - prev - 1), 0))
    last = jnp.max(jnp.where(ones, idx, -1))
    bits = bits + ueg_len(n - 1 - last)
    return _ceil8(bits)


def _substream_bytes(payload_bytes):
    """A length-prefixed aligned substream: UEG(len) aligned + len bytes
    (encode_motion / stability framing, dsv_encoder.c:256-327)."""
    return _ceil8(ueg_len(payload_bytes)) + payload_bytes


def plane_section_bytes(qvals, dc):
    """Byte length of one coefficient plane section
    (dsv_encode_plane wire layout, hzcc.c:449-496): [u32 len][SEG dc]
    [pad][u32 nruns][pad][UEG run / NEG value symbols][pad][0x55]."""
    qv = _i32(qvals).reshape(-1)
    nz = qv != 0
    idx = jnp.arange(qv.shape[0], dtype=jnp.int32)
    prev = _prev_one_excl(nz, idx)
    sym = jnp.where(nz, ueg_len(idx - prev - 1)
                    + neg_len(jnp.where(nz, qv, 1)), 0)
    return 4 + _ceil8(seg_len(dc)) + 4 + _ceil8(jnp.sum(sym)) + 1


def _mv_pred(left, top, topleft):
    """dsv_movec_pred component predictor (dsv.c:189-231): of {left,
    top}, the one closer to left+top-topleft."""
    dif = left + top - topleft
    return jnp.where(jnp.abs(dif - left) < jnp.abs(dif - top), left, top)


def motion_bytes(mode, mvx, mvy, submask, nbh: int, nbv: int):
    """Total byte length of the four motion substreams incl. their
    UEG length prefixes (encode_motion, dsv_encoder.c:256-327):
    mode ZBRLE, MV-x/y SEG residuals vs the raster predictor, intra
    sub-block masks (1 bit for full-intra, else 5)."""
    m = _i32(mode).reshape(nbv, nbh)
    inter = m == MODE_INTER
    ex = jnp.where(inter, _i32(mvx).reshape(nbv, nbh), 0)
    ey = jnp.where(inter, _i32(mvy).reshape(nbv, nbh), 0)

    def left(a):
        return jnp.pad(a, ((0, 0), (1, 0)))[:, :-1]

    def top(a):
        return jnp.pad(a, ((1, 0), (0, 0)))[:-1, :]

    def topleft(a):
        return jnp.pad(a, ((1, 0), (1, 0)))[:-1, :-1]

    px = _mv_pred(left(ex), top(ex), topleft(ex))
    py = _mv_pred(left(ey), top(ey), topleft(ey))
    bits_x = jnp.sum(jnp.where(inter, seg_len(ex - px), 0))
    bits_y = jnp.sum(jnp.where(inter, seg_len(ey - py), 0))
    sm = _i32(submask).reshape(nbv, nbh)
    bits_s = jnp.sum(jnp.where(inter, 0, jnp.where(sm == 0xF, 1, 5)))
    mode_b = zbrle_bytes(~inter)  # UEG per intra block + trailing run
    return (_substream_bytes(mode_b)
            + _substream_bytes(_ceil8(bits_x))
            + _substream_bytes(_ceil8(bits_y))
            + _substream_bytes(_ceil8(bits_s)))


def picture_len(blk_w: int, blk_h: int, nbh: int, nbv: int, qp_bits: int,
                stable, has_ref, mode, mvx, mvy, submask, qvals, dcs,
                maybe_p: bool):
    """Exact byte length of the picture packet dsv1n_pack_picture /
    dsv1n_pack_chunk would emit for these tensors.

    `maybe_p` is the static shape of the frame slot (False for GOP-start
    intra frames: the motion section is folded away entirely); `has_ref`
    is the traced per-frame verdict — a forced-intra frame in a P slot
    contributes zero motion bytes, matching the packer's has_ref gate.
    """
    def ueg_len_py(v: int) -> int:  # host-side: the block dims are static
        return 2 * ((v + 1).bit_length() - 1) + 1

    head = 18 + ((ueg_len_py(blk_w >> 2) + ueg_len_py(blk_h >> 2) + 7) >> 3)
    stab = jnp.asarray(stable).reshape(-1)
    total = head + _substream_bytes(zbrle_bytes((stab & 1) != 0))
    if maybe_p:
        mb = motion_bytes(mode, mvx, mvy, submask, nbh, nbv)
        total = total + jnp.where(jnp.asarray(has_ref), mb, 0)
    total = total + _ceil8(qp_bits)  # quant field + pre-plane alignment
    for qv, dc in zip(qvals, dcs):
        total = total + plane_section_bytes(qv, dc)
    return _i32(total)
