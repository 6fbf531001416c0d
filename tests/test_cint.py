"""Property tests for C integer semantics (the foundation of everything)."""

import numpy as np
import pytest

from dsv1_tpu.ops import cint


rng = np.random.default_rng(0)


def test_trunc_div_matches_c():
    a = rng.integers(-(2**30), 2**30, 20000).astype(np.int32)
    b = np.array([1, 2, 3, 4, 5, -2, -3, 7, 16, 64], np.int32)
    b = np.repeat(b, 2000)
    got = np.asarray(cint.trunc_div(a, b))
    # C semantics: truncation toward zero
    want = (np.abs(a.astype(np.int64)) // np.abs(b.astype(np.int64))) * np.sign(
        a.astype(np.int64)
    ) * np.sign(b.astype(np.int64))
    np.testing.assert_array_equal(got, want.astype(np.int32))


@pytest.mark.parametrize(
    "fn,add,shift",
    [(cint.round2, 1, 1), (cint.round4, 2, 2), (cint.round8, 4, 3)],
)
def test_rounding_shifts(fn, add, shift):
    v = rng.integers(-(2**24), 2**24, 10000).astype(np.int32)
    got = np.asarray(fn(v))
    a = np.abs(v.astype(np.int64))
    want = np.where(v < 0, -((a + add) >> shift), (a + add) >> shift)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_lb2_matches_reference():
    from . import oracle

    L = oracle.lib()
    vals = np.concatenate(
        [np.arange(1, 300), 2 ** np.arange(1, 30), 2 ** np.arange(1, 30) + 1]
    ).astype(np.int64)
    got = np.asarray(cint.lb2(vals.astype(np.int32)))
    want = np.array([L.dsv_lb2(int(v)) for v in vals])
    np.testing.assert_array_equal(got, want)
    for v in vals:
        assert cint.lb2_static(int(v)) == L.dsv_lb2(int(v))
