"""Golden tests: UEG/SEG/NEG codes and ZBRLE vs the reference bit I/O."""

import ctypes

import numpy as np

from dsv1_tpu.ops import golomb

from . import oracle


rng = np.random.default_rng(1)


def _ref_put(fn_name, values, max_bytes=1 << 20):
    L = oracle.lib()
    buf = np.zeros(max_bytes, np.uint8)
    bs = oracle.bs_new(buf)
    fn = getattr(L, fn_name)
    for v in values:
        fn(ctypes.byref(bs), int(v))
    pos = bs.pos
    L.dsv_bs_align(ctypes.byref(bs))
    return buf[: (bs.pos + 7) // 8].tobytes(), pos


def test_ueg_codes_match_reference():
    vals = np.concatenate(
        [np.arange(0, 1000), rng.integers(0, 2**20, 500), [2**24, 2**28 - 3]]
    )
    ref_bytes, ref_pos = _ref_put("dsv_bs_put_ueg", vals)
    w = golomb.BitWriter()
    codes, lens = golomb.ueg_codes(vals)
    w.put_symbols(codes, lens)
    assert w.pos == ref_pos
    assert w.getvalue() == ref_bytes


def test_seg_codes_match_reference():
    vals = np.concatenate([np.arange(-300, 300), rng.integers(-(2**17), 2**17, 500)])
    ref_bytes, ref_pos = _ref_put("dsv_bs_put_seg", vals)
    w = golomb.BitWriter()
    codes, lens = golomb.seg_codes(vals)
    w.put_symbols(codes, lens)
    assert w.pos == ref_pos
    assert w.getvalue() == ref_bytes


def test_neg_codes_match_reference():
    vals = np.concatenate(
        [np.arange(1, 300), -np.arange(1, 300), rng.integers(1, 2**17, 300),
         -rng.integers(1, 2**17, 300)]
    )
    ref_bytes, ref_pos = _ref_put("dsv_bs_put_neg", vals)
    w = golomb.BitWriter()
    codes, lens = golomb.neg_codes(vals)
    w.put_symbols(codes, lens)
    assert w.pos == ref_pos
    assert w.getvalue() == ref_bytes


def test_reader_roundtrip():
    vals = rng.integers(0, 2**16, 200)
    w = golomb.BitWriter()
    codes, lens = golomb.ueg_codes(vals)
    w.put_symbols(codes, lens)
    r = golomb.BitReader(w.getvalue())
    got = [r.get_ueg() for _ in vals]
    np.testing.assert_array_equal(got, vals)


def test_zbrle_matches_reference():
    L = oracle.lib()
    for density in (0.0, 0.05, 0.5, 0.95, 1.0):
        bits = (rng.random(997) < density).astype(np.uint8)
        buf = np.zeros(1 << 16, np.uint8)
        rle = oracle.DSV_ZBRLE()
        L.dsv_bs_init_rle(
            ctypes.byref(rle), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        for b in bits:
            L.dsv_bs_put_rle(ctypes.byref(rle), int(b))
        nbytes = L.dsv_bs_end_rle(ctypes.byref(rle), 0)
        ref = buf[:nbytes].tobytes()
        ours = golomb.zbrle_encode(bits)
        assert ours == ref
        # decode roundtrip
        got = golomb.zbrle_decode(ref, bits.size)
        np.testing.assert_array_equal(got, bits)
