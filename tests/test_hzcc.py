"""Golden tests: HZCC plane codec vs reference dsv_encode_plane/dsv_decode_plane."""

import ctypes

import numpy as np
import pytest

from dsv1_tpu.models import plane as plane_codec
from dsv1_tpu.ops import hzcc
from dsv1_tpu.ops.golomb import BitWriter

from . import oracle
from .test_sbt import _mk_coefs_struct, ref_fwd_sbt


rng = np.random.default_rng(11)


def _mk_stab(nbh, nbv, stable_blocks, is_p):
    params = oracle.DSV_PARAMS()
    params.nblocks_h = nbh
    params.nblocks_v = nbv
    params.blk_w = 16
    params.blk_h = 16
    stab = oracle.DSV_STABILITY()
    stab.params = ctypes.pointer(params)
    stab.stable_blocks = stable_blocks.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8))
    stab.isP = is_p
    return stab, params


def ref_encode_plane(coefs, q, is_p, plane_idx, stable_blocks, nbh, nbv):
    L = oracle.lib()
    work = coefs.copy()
    buf = np.zeros(coefs.size * 8 + 4096, np.uint8)
    bs = oracle.bs_new(buf)
    stab, params = _mk_stab(nbh, nbv, stable_blocks, is_p)
    stab.cur_plane = plane_idx
    c = _mk_coefs_struct(work)
    L.dsv_encode_plane(ctypes.byref(bs), ctypes.byref(c), q, ctypes.byref(stab))
    nbytes = (bs.pos + 7) // 8
    return buf[:nbytes].tobytes(), work


def ref_decode_plane(data, plane_len, w, h, q, is_p, plane_idx,
                     stable_blocks, nbh, nbv):
    L = oracle.lib()
    out = np.zeros((h, w), np.int32)
    stab, params = _mk_stab(nbh, nbv, stable_blocks, is_p)
    stab.cur_plane = plane_idx
    c = _mk_coefs_struct(out)
    arr = np.frombuffer(data, np.uint8).copy()
    L.dsv_decode_plane(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint(plane_len), ctypes.byref(c), q, ctypes.byref(stab))
    return out


CASES = [
    # (w, h, is_p, q, plane_idx)
    (352, 288, 0, 1024, 0),
    (352, 288, 1, 200, 0),
    (176, 144, 1, 786, 1),
    (176, 144, 0, 57, 2),
    (64, 48, 1, 16, 0),
    (44, 36, 0, 2047, 1),
    (354, 290, 1, 300, 0),  # odd ceil dims -> band overlap path
]


@pytest.mark.parametrize("w,h,is_p,q,plane_idx", CASES)
def test_encode_plane_matches_reference(w, h, is_p, q, plane_idx):
    nbh, nbv = (w + 15) // 16, (h + 15) // 16
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    coefs = ref_fwd_sbt(plane, is_p)
    stable = rng.integers(0, 4, nbh * nbv).astype(np.uint8)

    ref_bytes, ref_recon = ref_encode_plane(
        coefs, q, is_p, plane_idx, stable, nbh, nbv)

    tables = hzcc.build_tables(w, h, nbh, nbv)
    qvals, recon = hzcc.encode_plane_core(
        coefs, q, bool(is_p), plane_idx, stable, tables)
    wtr = BitWriter()
    plane_codec.encode_plane_bits(wtr, np.asarray(qvals), int(coefs[0, 0]))
    ours = wtr.getvalue()

    np.testing.assert_array_equal(np.asarray(recon), ref_recon)
    assert ours == ref_bytes


@pytest.mark.parametrize("w,h,is_p,q,plane_idx", CASES)
def test_decode_plane_matches_reference(w, h, is_p, q, plane_idx):
    nbh, nbv = (w + 15) // 16, (h + 15) // 16
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    coefs = ref_fwd_sbt(plane, is_p)
    stable = rng.integers(0, 4, nbh * nbv).astype(np.uint8)
    ref_bytes, _ = ref_encode_plane(coefs, q, is_p, plane_idx, stable, nbh, nbv)

    # strip the 32-bit length prefix like the picture decoder does
    plen = int.from_bytes(ref_bytes[:4], "big")
    body = np.frombuffer(ref_bytes[4:], np.uint8)

    ref_coefs = ref_decode_plane(ref_bytes[4:], plen, w, h, q, is_p,
                                 plane_idx, stable, nbh, nbv)
    tables = hzcc.build_tables(w, h, nbh, nbv)
    ours = plane_codec.decode_plane_bits(
        body, plen, w, h, q, bool(is_p), plane_idx, stable, tables)
    np.testing.assert_array_equal(ours, ref_coefs)


def test_tables_overlap_detection():
    t1 = hzcc.build_tables(352, 288, 22, 18)
    assert not t1.has_overlap
    t2 = hzcc.build_tables(354, 290, 23, 19)
    assert t2.has_overlap
