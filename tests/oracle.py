"""Golden oracle: ctypes bindings to the compiled reference C codec.

The reference at /root/reference is compiled (unmodified, out-of-tree) into
build/libdsv1ref.so and build/dsv1; this module wraps the public entry points
so unit tests can differential-test every kernel. See SURVEY.md §4.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
BUILD = Path(__file__).resolve().parent.parent / "build"
LIB = BUILD / "libdsv1ref.so"
BIN = BUILD / "dsv1"


def build_oracle():
    BUILD.mkdir(exist_ok=True)
    srcs = sorted(str(p) for p in REF.glob("*.c"))
    lib_srcs = [s for s in srcs if not s.endswith("dsv_main.c")]
    if not LIB.exists() or LIB.stat().st_mtime < max(os.path.getmtime(s) for s in srcs):
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", *lib_srcs, "-o", str(LIB)], check=True
        )
    if not BIN.exists():
        subprocess.run(["gcc", "-O2", *srcs, "-o", str(BIN)], check=True)
    return LIB, BIN


class DSV_BS(ctypes.Structure):
    _fields_ = [("start", ctypes.POINTER(ctypes.c_uint8)), ("pos", ctypes.c_uint)]


class DSV_ZBRLE(ctypes.Structure):
    _fields_ = [("bs", DSV_BS), ("nz", ctypes.c_int)]


class DSV_META(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int), ("height", ctypes.c_int), ("subsamp", ctypes.c_int),
        ("fps_num", ctypes.c_int), ("fps_den", ctypes.c_int),
        ("aspect_num", ctypes.c_int), ("aspect_den", ctypes.c_int),
    ]


class DSV_PLANE(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_uint8)), ("len", ctypes.c_int),
        ("format", ctypes.c_int), ("stride", ctypes.c_int),
        ("w", ctypes.c_int), ("h", ctypes.c_int),
        ("hs", ctypes.c_int), ("vs", ctypes.c_int),
    ]


class DSV_COEFS(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_int32)),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
    ]


class DSV_PARAMS(ctypes.Structure):
    _fields_ = [
        ("vidmeta", ctypes.POINTER(DSV_META)),
        ("is_ref", ctypes.c_int), ("has_ref", ctypes.c_int),
        ("blk_w", ctypes.c_int), ("blk_h", ctypes.c_int),
        ("nblocks_h", ctypes.c_int), ("nblocks_v", ctypes.c_int),
    ]


class DSV_STABILITY(ctypes.Structure):
    _fields_ = [
        ("params", ctypes.POINTER(DSV_PARAMS)),
        ("stable_blocks", ctypes.POINTER(ctypes.c_uint8)),
        ("cur_plane", ctypes.c_uint8), ("isP", ctypes.c_uint8),
    ]


class MVunion(ctypes.Union):
    _fields_ = [("xy", ctypes.c_int16 * 2), ("all", ctypes.c_int32)]


class DSV_MV(ctypes.Structure):
    _fields_ = [
        ("u", MVunion), ("mode", ctypes.c_uint8), ("submask", ctypes.c_uint8),
        ("lo_var", ctypes.c_uint8), ("lo_tex", ctypes.c_uint8),
        ("high_detail", ctypes.c_uint8),
    ]


class DSV_FRAME(ctypes.Structure):
    _fields_ = [
        ("alloc", ctypes.POINTER(ctypes.c_uint8)),
        ("planes", DSV_PLANE * 3),
        ("refcount", ctypes.c_int), ("format", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("border", ctypes.c_int),
    ]


_lib = None


def lib():
    global _lib
    if _lib is None:
        build_oracle()
        _lib = ctypes.CDLL(str(LIB))
        L = _lib
        L.dsv_mk_frame.restype = ctypes.POINTER(DSV_FRAME)
        L.dsv_clone_frame.restype = ctypes.POINTER(DSV_FRAME)
        L.dsv_load_planar_frame.restype = ctypes.POINTER(DSV_FRAME)
        L.dsv_bs_get_ueg.restype = ctypes.c_uint
        L.dsv_bs_get_bits.restype = ctypes.c_uint
        L.dsv_bs_get_bit.restype = ctypes.c_uint
        L.dsv_get_quant.restype = ctypes.c_int
        L.dsv_lb2.restype = ctypes.c_int
    return _lib


def bs_new(buf: np.ndarray) -> DSV_BS:
    s = DSV_BS()
    lib().dsv_bs_init(ctypes.byref(s), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return s


def mk_frame_from_plane(plane: np.ndarray, border: int = 1, subsamp: int = 0x6):
    """Make a bordered reference DSV_FRAME whose luma equals `plane` (uint8)."""
    h, w = plane.shape
    L = lib()
    f = L.dsv_mk_frame(subsamp, w, h, border)
    p = f.contents.planes[0]
    for y in range(h):
        ctypes.memmove(
            ctypes.addressof(p.data.contents) + y * p.stride,
            plane[y].ctypes.data, w,
        )
    L.dsv_extend_frame(f)
    return f


def frame_plane(f, c: int) -> np.ndarray:
    p = f.contents.planes[c]
    buf = ctypes.cast(p.data, ctypes.POINTER(ctypes.c_uint8 * (p.stride * p.h)))
    arr = np.frombuffer(buf.contents, dtype=np.uint8).reshape(p.h, p.stride)
    return arr[:, : p.w].copy()


class DSV_HME(ctypes.Structure):
    _fields_ = [
        ("params", ctypes.POINTER(DSV_PARAMS)),
        ("src", ctypes.POINTER(DSV_FRAME) * 6),
        ("ref", ctypes.POINTER(DSV_FRAME) * 6),
        ("mvf", ctypes.POINTER(DSV_MV) * 6),
        ("levels", ctypes.c_int),
    ]


def mk_frame_planar(planes, subsamp, border=1):
    """Bordered reference frame from (y, u, v) numpy planes, extended."""
    L = lib()
    h, w = planes[0].shape
    f = L.dsv_mk_frame(subsamp, w, h, border)
    for c in range(3):
        p = f.contents.planes[c]
        arr = planes[c]
        for y in range(p.h):
            ctypes.memmove(
                ctypes.addressof(p.data.contents) + y * p.stride,
                arr[y].ctypes.data, p.w)
    L.dsv_extend_frame(f)
    return f


def mk_pyramid(padded, levels, subsamp):
    """mk_pyramid (dsv_encoder.c:194-217) via public frame API."""
    L = lib()
    out = []
    prev = padded
    w = padded.contents.width
    h = padded.contents.height
    for i in range(levels):
        pw = (w + (1 << (i + 1)) - 1) >> (i + 1)
        ph = (h + (1 << (i + 1)) - 1) >> (i + 1)
        f = L.dsv_mk_frame(subsamp, pw, ph, 1)
        L.dsv_ds2x_frame_luma(f, prev)
        L.dsv_extend_frame_luma(f)
        out.append(f)
        prev = f
    return out


def run_hme(src_frames, ref_frames, params, levels):
    """dsv_hme via ctypes; returns structured numpy of the level-0 MV field."""
    L = lib()
    hme = DSV_HME()
    hme.params = ctypes.pointer(params)
    hme.levels = levels
    for i in range(levels + 1):
        hme.src[i] = src_frames[i]
        hme.ref[i] = ref_frames[i]
    intra_pct = L.dsv_hme(ctypes.byref(hme))
    nb = params.nblocks_h * params.nblocks_v
    mvs = ctypes.cast(hme.mvf[0], ctypes.POINTER(DSV_MV * nb)).contents
    out = {
        "mvx": np.array([m.u.xy[0] for m in mvs], np.int32),
        "mvy": np.array([m.u.xy[1] for m in mvs], np.int32),
        "mode": np.array([m.mode for m in mvs], np.int32),
        "submask": np.array([m.submask for m in mvs], np.int32),
        "lo_var": np.array([m.lo_var for m in mvs], np.int32),
        "lo_tex": np.array([m.lo_tex for m in mvs], np.int32),
        "high_detail": np.array([m.high_detail for m in mvs], np.int32),
    }
    for i in range(levels + 1):
        L.dsv_free(hme.mvf[i])
    return out, intra_pct
