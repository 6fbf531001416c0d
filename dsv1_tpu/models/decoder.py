"""DSV1 decoder — bit-exact against the reference decoder.

Pipeline per picture packet (reference dsv_decoder.c:286-472): parse header
fields and the stability/motion substreams (native bit-serial layer), then
reconstruct on device: vectorized dequant scatter -> inverse subband
transform -> (P frames) whole-plane motion compensation + residual add.

Host work is limited to byte-level parsing; every per-pixel operation is a
jitted device function, cached per (geometry, frame-kind).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bits
from ..constants import (MAX_QP_BITS, MIN_BLOCK_SIZE, MAX_BLOCK_SIZE,
                         MODE_INTRA, PT_EOS, PT_META, div_round, pt_has_ref,
                         pt_is_pic, pt_is_ref, round_pow2)
from ..ops import bmc, frame as fr, hzcc, sbt
from ..ops.golomb import BitReader
from .bitstream import iter_packets, parse_metadata, parse_packet_hdr
from .metadata import Metadata
from .plane import decode_plane_bits

DEC_OK = 0
DEC_ERROR = 1
DEC_EOS = 2
DEC_GOT_META = 3


@lru_cache(maxsize=32)
def _jit_plane_tail(cw: int, ch: int, w: int, h: int, is_p: bool,
                    is_luma: bool):
    """inv_sbt + recomposition for one plane geometry."""

    @jax.jit
    def f(coefs, q):
        rec = sbt.inv_sbt(coefs, q, is_p=is_p, is_luma=is_luma)
        return sbt.coefs_to_plane(rec)[:h, :w]

    return f


@lru_cache(maxsize=8)
def _jit_p_recon(layout: fr.FrameLayout, blk_w: int, blk_h: int,
                 nbh: int, nbv: int):
    """P-frame reconstruction: compensate + add residual + re-extend."""

    @jax.jit
    def f(ref_img, residuals, modes, mvx, mvy, submask):
        outs = []
        for c in range(3):
            ref_plane = fr.plane_view(ref_img, layout, c)
            pred = bmc.compensate_plane(
                ref_img, ref_plane, layout, c, blk_w, blk_h, nbh, nbv,
                modes, mvx, mvy, submask)
            outs.append(bmc.add_residual(pred, residuals[c]))
        new_img = fr.image_from_planes(layout, outs)
        return outs, new_img

    return f


@lru_cache(maxsize=8)
def _jit_i_image(layout: fr.FrameLayout):
    @jax.jit
    def f(planes):
        return fr.image_from_planes(layout, planes)

    return f


class Decoder:
    """Mirrors the reference decoder API (dsv_decoder.h:52-59)."""

    def __init__(self, draw_info: int = 0):
        self.meta: Metadata | None = None
        self.got_metadata = False
        self.draw_info = draw_info
        self._ref_img = None    # extended device image of the last ref frame

    def get_metadata(self) -> Metadata | None:
        return self.meta

    def decode_packet(self, data: bytes):
        """Returns (code, planes_or_None, fnum). planes: 3 np uint8 arrays."""
        try:
            pkt_type = parse_packet_hdr(data)
        except ValueError:
            return DEC_ERROR, None, -1
        if not pt_is_pic(pkt_type):
            if pkt_type == PT_META:
                self.meta = parse_metadata(data)
                self.got_metadata = True
                return DEC_GOT_META, None, -1
            if pkt_type == PT_EOS:
                return DEC_EOS, None, -1
            return DEC_ERROR, None, -1
        if not self.got_metadata:
            return DEC_OK, None, -1
        try:
            return self._decode_picture(pkt_type, data)
        except (IndexError, ValueError):
            # corrupt/truncated picture: the reference tolerates these via
            # in-stream guards (hzcc.c:337-339, dsv_decoder.c:398-401)
            return DEC_ERROR, None, -1

    def _decode_picture(self, pkt_type: int, data: bytes):
        meta = self.meta
        has_ref = pt_has_ref(pkt_type)
        is_ref = pt_is_ref(pkt_type)
        arr = np.frombuffer(data, np.uint8)
        r = BitReader(data)
        r.skip_bytes(14)
        fno = r.get_bits(32)
        r.align()
        blk_w = r.get_ueg() << 2
        blk_h = r.get_ueg() << 2
        if not (MIN_BLOCK_SIZE <= blk_w <= MAX_BLOCK_SIZE
                and MIN_BLOCK_SIZE <= blk_h <= MAX_BLOCK_SIZE):
            return DEC_ERROR, None, -1
        nbh = div_round(meta.width, blk_w)
        nbv = div_round(meta.height, blk_h)

        # B.2.3.1 stability blocks
        r.align()
        slen = r.get_ueg()
        r.align()
        stable = bits.zbrle_decode(arr[r.byte_pos:r.byte_pos + slen],
                                   nbh * nbv)
        r.skip_bytes(slen)

        modes = mvx = mvy = submask = None
        if has_ref:
            r.align()
            subs = []
            for _ in range(4):
                ln = r.get_ueg()
                r.align()
                subs.append(arr[r.byte_pos:r.byte_pos + ln])
                r.skip_bytes(ln)
                r.align()
            modes, mvx, mvy, submask = bits.decode_motion(
                subs[0], subs[1], subs[2], subs[3], nbh, nbv)
            stable = stable | ((modes == MODE_INTRA).astype(np.uint8) << 1)

        r.align()
        quant = r.get_bits(MAX_QP_BITS)

        # B.2.3.3 plane decoding
        layout = fr.make_layout(meta.subsamp, meta.width, meta.height, True)
        planes = []
        for c in range(3):
            p = layout.planes[c]
            if c > 0:
                cw, ch = round_pow2(p.w, 1), round_pow2(p.h, 1)
            else:
                cw, ch = p.w, p.h
            r.align()
            plen = r.get_bits(32)
            r.align()
            framesz = cw * ch * 4
            if plen <= 0 or plen > framesz * 2:
                return DEC_ERROR, None, -1
            tables = hzcc.build_tables(cw, ch, nbh, nbv)
            coefs = decode_plane_bits(
                arr[r.byte_pos:], plen, cw, ch, quant, bool(has_ref), c,
                stable, tables)
            r.skip_bytes(plen)
            tail = _jit_plane_tail(cw, ch, p.w, p.h, bool(has_ref), c == 0)
            planes.append(tail(coefs, jnp.int32(quant)))

        if has_ref:
            if self._ref_img is None:
                return DEC_ERROR, None, -1
            recon = _jit_p_recon(layout, blk_w, blk_h, nbh, nbv)
            outs, new_img = recon(
                self._ref_img, planes,
                jnp.asarray(modes), jnp.asarray(mvx), jnp.asarray(mvy),
                jnp.asarray(submask))
        else:
            outs = planes
            new_img = None

        if is_ref:
            if new_img is None:
                new_img = _jit_i_image(layout)(outs)
            self._ref_img = new_img

        result = [np.asarray(o) for o in outs]
        if self.draw_info and has_ref:
            from .overlay import draw_info as _draw
            result = _draw(result, stable, modes, mvx, mvy, submask,
                           blk_w, blk_h, nbh, nbv, self.draw_info)
        return DEC_OK, result, fno

    def decode_stream(self, stream: bytes):
        """Iterate decoded frames of a .dsv byte stream -> (fnum, planes)."""
        for _t, pkt in iter_packets(stream):
            code, planes, fno = self.decode_packet(pkt)
            if code == DEC_EOS:
                return
            if code == DEC_OK and planes is not None:
                yield fno, planes
