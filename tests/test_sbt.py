"""Golden tests: subband transforms vs the reference dsv_fwd_sbt/dsv_inv_sbt."""

import ctypes

import numpy as np
import pytest

from dsv1_tpu.ops import sbt

from . import oracle


rng = np.random.default_rng(7)


def _mk_plane_struct(arr: np.ndarray) -> oracle.DSV_PLANE:
    h, w = arr.shape
    p = oracle.DSV_PLANE()
    p.data = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    p.stride = w
    p.w = w
    p.h = h
    p.len = w * h
    return p


def _mk_coefs_struct(arr: np.ndarray) -> oracle.DSV_COEFS:
    h, w = arr.shape
    c = oracle.DSV_COEFS()
    c.data = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    c.width = w
    c.height = h
    return c


def ref_fwd_sbt(plane: np.ndarray, is_p: int) -> np.ndarray:
    L = oracle.lib()
    h, w = plane.shape
    coefs = np.zeros((h, w), np.int32)
    p = _mk_plane_struct(plane)
    c = _mk_coefs_struct(coefs)
    L.dsv_fwd_sbt(ctypes.byref(p), ctypes.byref(c), is_p)
    return coefs


def ref_inv_sbt(coefs: np.ndarray, q: int, is_p: int, cidx: int) -> np.ndarray:
    L = oracle.lib()
    h, w = coefs.shape
    work = coefs.copy()
    out = np.zeros((h, w), np.uint8)
    p = _mk_plane_struct(out)
    c = _mk_coefs_struct(work)
    L.dsv_inv_sbt(ctypes.byref(p), ctypes.byref(c), q, is_p, cidx)
    return out


SIZES_EVEN = [(64, 48), (352, 288), (20, 24), (176, 144)]
SIZES_ODD = [(17, 23), (353, 289), (21, 16)]


@pytest.mark.parametrize("w,h", SIZES_EVEN + SIZES_ODD)
def test_fwd_sbt_p_frames(w, h):
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    ref = ref_fwd_sbt(plane, 1)
    ours = np.asarray(sbt.fwd_sbt(sbt.plane_to_coefs(plane), is_p=True))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("w,h", SIZES_EVEN)
def test_fwd_sbt_i_frames_b4t(w, h):
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    ref = ref_fwd_sbt(plane, 0)
    ours = np.asarray(sbt.fwd_sbt(sbt.plane_to_coefs(plane), is_p=False))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("w,h", SIZES_EVEN)
@pytest.mark.parametrize("is_p", [0, 1])
@pytest.mark.parametrize("q", [16, 137, 512, 2047])
def test_inv_sbt_luma_filtered(w, h, is_p, q):
    # Use realistic coefficients: forward transform of a noisy gradient,
    # coarsely quantized like the in-loop recon would be.
    x = np.linspace(0, 255, w)[None, :] + np.linspace(0, 64, h)[:, None]
    plane = np.clip(x + rng.integers(-20, 20, (h, w)), 0, 255).astype(np.uint8)
    coefs = ref_fwd_sbt(plane, is_p)
    coefs = (coefs // 32) * 32
    ref = ref_inv_sbt(coefs, q, is_p, 0)
    ours = np.asarray(
        sbt.coefs_to_plane(
            sbt.inv_sbt(coefs.copy(), jnp_q(q), is_p=bool(is_p), is_luma=True)
        )
    )
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("w,h", SIZES_EVEN + SIZES_ODD)
@pytest.mark.parametrize("is_p", [0, 1])
def test_inv_sbt_chroma_simple(w, h, is_p):
    if (w % 2 or h % 2) and not is_p:
        pytest.skip("odd-dim B4T is UB in the reference")
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    coefs = ref_fwd_sbt(plane, is_p)
    coefs = (coefs // 16) * 16
    ref = ref_inv_sbt(coefs, 100, is_p, 1)
    ours = np.asarray(
        sbt.coefs_to_plane(
            sbt.inv_sbt(coefs.copy(), jnp_q(100), is_p=bool(is_p), is_luma=False)
        )
    )
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("w,h", SIZES_ODD)
@pytest.mark.parametrize("q", [16, 512])
def test_inv_sbt_luma_filtered_odd_dims_p(w, h, q):
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    coefs = ref_fwd_sbt(plane, 1)
    coefs = (coefs // 32) * 32
    ref = ref_inv_sbt(coefs, q, 1, 0)
    ours = np.asarray(
        sbt.coefs_to_plane(sbt.inv_sbt(coefs.copy(), jnp_q(q), is_p=True, is_luma=True))
    )
    np.testing.assert_array_equal(ours, ref)


def jnp_q(q):
    import jax.numpy as jnp

    return jnp.int32(q)


def test_get_quant_matches_reference():
    L = oracle.lib()
    for q in range(1, 2048, 37):
        for is_p in (0, 1):
            for lvl in (0, 1, 2):
                assert int(sbt.get_quant(q, bool(is_p), lvl)) == L.dsv_get_quant(
                    q, is_p, lvl
                ), (q, is_p, lvl)
