"""Plane-level coefficient coding: the dsv_encode_plane/dsv_decode_plane
equivalents (reference hzcc.c:449-496).

Wire layout per plane:
  [align][u32 length][SEG raw DC][align][u32 nruns][align]
  [interleaved (UEG run, NEG value) symbols][align][u8 0x55 EOP][align]
where length = bytes from the length field to EOP inclusive, minus 4.

The quantize/write-back pass runs on device (ops/hzcc.py); this module does
host-side symbol interleaving + vectorized bit packing on encode, and native
parsing + vectorized scatter on decode.
"""

import numpy as np

from .. import bits
from ..constants import EOP_SYMBOL
from ..ops import hzcc
from ..ops.golomb import BitReader, BitWriter, neg_codes, ueg_codes


def interleave_symbols(runs: np.ndarray, vals: np.ndarray):
    """Stream order: r0, (r1 v0), (r2 v1), ..., v_last (hzcc.c:176-284)."""
    n = runs.size
    rc, rl = ueg_codes(runs)
    if n == 0:
        return rc[:0], rl[:0]
    vc, vl = neg_codes(vals)
    codes = np.empty(2 * n, np.uint64)
    lens = np.empty(2 * n, np.int64)
    codes[0], lens[0] = rc[0], rl[0]
    codes[1:2 * n - 2:2], lens[1:2 * n - 2:2] = rc[1:], rl[1:]
    codes[2:2 * n - 1:2], lens[2:2 * n - 1:2] = vc[:-1], vl[:-1]
    codes[2 * n - 1], lens[2 * n - 1] = vc[-1], vl[-1]
    return codes, lens


def encode_plane_bits(w: BitWriter, qvals, dc: int):
    """Serialize one plane's symbols into the writer (hzcc.c:449-476).

    qvals: dense traversal-ordered quantized values, or a precomputed
    (runs, vals) pair (e.g. from the device-side nonzero compaction in
    parallel/gop.py)."""
    w.align()
    startp = w.byte_pos
    w.put_bits(32, 0)  # length placeholder
    w.put_seg(int(dc))
    # hzcc section (hzcc.c:151-292)
    w.align()
    nruns_bitpos = w.pos
    w.put_bits(32, 0)  # nruns placeholder
    w.align()
    if isinstance(qvals, tuple):
        runs, vals = qvals
    else:
        runs, vals = hzcc.runs_from_qvals(qvals)
    codes, lens = interleave_symbols(runs, vals)
    w.put_symbols(codes, lens)
    w.align()
    w.patch_bits(nruns_bitpos, 32, int(runs.size))
    w.put_bits(8, EOP_SYMBOL)
    w.align()
    endp = w.byte_pos
    w.patch_bits(startp * 8, 32, (endp - startp) - 4)
    return endp - startp


def parse_plane_bits(buf: np.ndarray, plane_len: int,
                     tables: hzcc.TraversalTables):
    """Parse one plane section -> (dc, runs, vals) without dequantizing.

    buf: byte array starting at the plane section (after the u32 length).
    """
    r = BitReader(buf[:16].tobytes())
    dc = r.get_seg()
    r.align()
    hzcc_off = r.byte_pos
    runs, vals, _nruns, _end = bits.parse_hzcc(
        buf[hzcc_off:], max(plane_len - hzcc_off, 0), tables.n
    )
    return dc, runs, vals


def decode_plane_bits(buf: np.ndarray, plane_len: int, W: int, H: int,
                      q: int, is_p: bool, plane_idx: int,
                      stable_blocks: np.ndarray,
                      tables: hzcc.TraversalTables):
    """Parse + dequantize one plane section -> (H, W) int32 coefficients.

    buf: byte array starting at the plane section (after the u32 length).
    """
    dc, runs, vals = parse_plane_bits(buf, plane_len, tables)
    return hzcc.decode_plane_scatter(
        W, H, runs, vals, q, is_p, plane_idx, stable_blocks, dc, tables
    )
