"""Pallas TPU kernel for the HME candidate-select + 9-point refine.

Why a kernel: this stage is per-block dynamic window fetches (candidate
MVs differ per block — reference hme.c:452-541), which in pure XLA lower
to huge slice-gathers that the TPU backend stages through a small scoped
VMEM window at 2-3 GB/s (measured: the two gather fusions alone were
~90ms of a 261ms CIF GOP chunk). Here the whole reference plane sits
resident in VMEM (CIF ext luma 200KB, 1080p 2.5MB — v5e VMEM is ~16MB),
grid steps walk block batches, and each block's candidate SADs + 9-point
refine run entirely on-chip: no window tensors ever touch HBM, outputs
are three scalars per block.

Semantics match ops/hme.py `_refine_common` (which mirrors reference
hme.c refine_level): candidate windows scored by masked SAD with
validity bounds, first-minimum argmin over slots, full-pel clamp, then
the 9-point pattern in XF/YF order with strict first-minimum selection.
Out-of-buffer reads (possible only in the 9-point step, where the
reference itself reads out of bounds — undefined behavior in C) are
clamped to the plane edge here; golden tests arbitrate that this never
affects real streams.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import FRAME_BORDER
from .frame import FrameLayout

# search point tables (hme.c:422-427) — must match ops/hme.py
XF = (0, 1, -1, 0, 0, -1, 1, -1, 1)
YF = (0, 0, 0, 1, -1, -1, -1, 1, 1)

CHUNK = 128  # max blocks per grid step (shrunk for small grids)


def _chunk_of(nb: int) -> int:
    """Blocks per grid step: coarse pyramid levels have single-digit
    block counts — padding them to 128 serial iterations wastes ~95% of
    the grid step (each padded block still pays its window loads)."""
    return min(CHUNK, ((nb + 7) // 8) * 8)


def _load(ref, rr, cc, H_: int, W_: int, aligned: bool = False,
          lead: tuple = (0,)):
    """(H_, W_) i32 window at dynamic (rr, cc) from a VMEM-resident
    (1, EHP, SP) u8 plane.

    Mosaic requires provably aligned vector-load starts (8 sublanes /
    128 lanes), so: load the aligned superset, lane-rotate into place
    (dynamic sublane rotates miscompile on real TPUs — verified, they
    rotate within 8-row tiles — hence the select), then resolve the
    sublane offset with a 3-step binary shift-select (3 selects of
    decreasing height vs the naive 8-way's 7; Mosaic has no sub-32-bit
    lane rotate — "Rotate with non-32-bit data not implemented" — so
    the superset converts to i32 before the roll). When W_ <= 128 the
    superset is cut to its first 128 lanes right after the rotate
    left-aligns the payload, halving the select traffic.

    aligned=True asserts rr % 8 == 0 and skips the sublane select
    entirely: block-origin rows are E + gj*BH with E and every legal
    block size a multiple of 8 (dsv.h:50-51 sizes 16..64; callers mask
    their row clips with & ~7)."""
    if aligned:
        r8 = pl.multiple_of(rr, 8)
        RH = ((H_ + 7) // 8) * 8
    else:
        r8 = pl.multiple_of(rr & ~7, 8)
        RH = ((H_ + 8 + 7) // 8) * 8
    c128 = pl.multiple_of(cc & ~127, 128)
    LW = ((W_ + 128 + 127) // 128) * 128
    big = ref[(*lead, pl.ds(r8, RH), pl.ds(c128, LW))].astype(jnp.int32)
    big = pltpu.roll(big, -(cc - c128), axis=1)
    if W_ <= 128:
        big = big[:, :128]
    if aligned:
        win = big[0:H_]
    else:
        off = rr - r8
        w4 = jnp.where(off >= 4, big[4:4 + H_ + 3], big[0:H_ + 3])
        w2 = jnp.where((off & 2) != 0, w4[2:2 + H_ + 1], w4[0:H_ + 1])
        win = jnp.where((off & 1) != 0, w2[1:1 + H_], w2[0:H_])
    return win[:, :W_]

# VMEM budget guard: src+ref planes x2 (pallas double-buffers blocks).
# Above this (4K luma ~9.4MB) fall back to the XLA path.
MAX_PLANE_BYTES = 4 << 20


def use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _plane_vmem_bytes(layout: FrameLayout) -> int:
    """Padded VMEM footprint of one extended luma plane as the kernels
    allocate it (EHP x SP u8; see refine_*_pallas wrappers)."""
    p = layout.planes[0]
    EH = p.h + 2 * p.ext
    return (((EH + 7) & ~7) + 16) * (p.stride + 256)


def pallas_supported(layouts, effort: int) -> bool:
    """Can the pallas HME path run this geometry within VMEM?

    Level 0 streams SRC per block row with REF resident when the plane
    exceeds MAX_PLANE_BYTES (the banded base kernel), so full-res size
    is unbounded for effort 0. The coarse refine kernels (levels >= 1)
    and the effort>0 level-0 refine keep BOTH planes resident, so their
    planes must fit the budget; at 4K level 1 is ~2.7 MB (fits) — 8K+
    or effort>0-at-4K fall back to the XLA search path."""
    if effort != 0 and _plane_vmem_bytes(layouts[0]) > MAX_PLANE_BYTES:
        return False
    if len(layouts) > 1 and _plane_vmem_bytes(layouts[1]) > MAX_PLANE_BYTES:
        return False
    return True


def _masked_sad(a, b, colm, rowm):
    d = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
    return jnp.sum(jnp.where(colm & rowm, d, 0))


def _refine_kernel(cm_ref, src_ref, ref_ref, dx_ref, dy_ref, best_ref, *,
                   EH: int, S: int, E: int, w: int, h: int, nbh_l: int,
                   BW: int, BH: int, NC: int, level: int, chunk: int):
    """One grid step: `chunk` blocks of one batch element.

    cm_ref: SMEM (1, chunk, 2*NC) i32 candidate MVs in full-res units
            (x slots then y slots, matching hme.c:452-510 inheritance).
    src/ref: VMEM (1, EHP, S) u8 extended planes, row-padded so that any
    window load can start at the 8-aligned row below it (Mosaic requires
    provably 8-aligned sublane starts; the wrapper pads EH -> EHP >= EH+8).
    dx/dy/best: SMEM out.
    """
    c = pl.program_id(1)
    imax = jnp.int32(2**31 - 1)
    b = FRAME_BORDER
    cols = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    load = _load

    def body(i, _):
        t = c * chunk + i
        gi = jax.lax.rem(t, nbh_l)
        gj = jax.lax.div(t, nbh_l)
        bx = gi * BW
        by = gj * BH
        inframe = (bx < w) & (by < h)
        bw_c = jnp.clip(w - bx, 0, BW)
        bh_c = jnp.clip(h - by, 0, BH)
        colm = cols < bw_c
        rowm = rows < bh_c
        # clamps keep grid-padding blocks (t >= nb, discarded) in bounds;
        # & ~7 preserves the block-origin row alignment under the clamp
        srcw = load(src_ref, jnp.clip(E + by, 0, (EH - BH) & ~7),
                    jnp.clip(E + bx, 0, S - BW), BH, BW, aligned=True)

        # --- candidate SADs (hme.c:452-510)
        bsad = imax
        bk = jnp.int32(0)
        for k in range(NC):
            mx = cm_ref[0, i, k]
            my = cm_ref[0, i, NC + k]
            rx = bx + (mx >> level) if level else bx + mx
            ry = by + (my >> level) if level else by + my
            ok = ((rx >= -b) & (ry >= -b) & (rx + bw_c <= w + b)
                  & (ry + bh_c <= h + b) & inframe)
            rr = jnp.clip(E + ry, 0, EH - BH)
            cc = jnp.clip(E + rx, 0, S - BW)
            refw = load(ref_ref, rr, cc, BH, BW)
            sad = jnp.where(ok, _masked_sad(srcw, refw, colm, rowm), imax)
            take = sad < bsad
            bk = jnp.where(take, jnp.int32(k), bk)
            bsad = jnp.where(take, sad, bsad)
        bdx = jnp.int32(0)
        bdy = jnp.int32(0)
        for k in range(NC):
            sel = bk == k
            bdx = jnp.where(sel, cm_ref[0, i, k], bdx)
            bdy = jnp.where(sel, cm_ref[0, i, NC + k], bdy)
        if level:
            bdx = bdx >> level
            bdy = bdy >> level
        # full-pel clamp (hme.c:519-520)
        bdx = jnp.clip(bdx, -bw_c - bx, w - bx)
        bdy = jnp.clip(bdy, -bh_c - by, h - by)

        # --- 9-point refine (hme.c:526-541): one padded window, 9 views
        rr = jnp.clip(E + by + bdy - 1, 0, EH - (BH + 2))
        cc = jnp.clip(E + bx + bdx - 1, 0, S - (BW + 2))
        padw = load(ref_ref, rr, cc, BH + 2, BW + 2)
        best = imax
        m9 = jnp.int32(0)
        for k in range(9):
            oy, ox = YF[k] + 1, XF[k] + 1
            sad = _masked_sad(srcw, padw[oy:oy + BH, ox:ox + BW], colm, rowm)
            take = sad < best
            m9 = jnp.where(take, jnp.int32(k), m9)
            best = jnp.where(take, sad, best)
        ox9 = jnp.int32(0)
        oy9 = jnp.int32(0)
        for k in range(9):
            sel = m9 == k
            ox9 = jnp.where(sel, jnp.int32(XF[k]), ox9)
            oy9 = jnp.where(sel, jnp.int32(YF[k]), oy9)
        dx = bdx + ox9
        dy = bdy + oy9
        dx_ref[0, 0, t] = dx
        dy_ref[0, 0, t] = dy
        best_ref[0, 0, t] = best
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.lru_cache(maxsize=64)
def _build_call(B: int, NBP: int, EH: int, EHP: int, S: int, SP: int,
                E: int, w: int, h: int, nbh_l: int, BW: int, BH: int,
                NC: int, level: int, chunk: int, interpret: bool):
    kern = functools.partial(_refine_kernel, EH=EH, S=S, E=E, w=w, h=h,
                             nbh_l=nbh_l, BW=BW, BH=BH, NC=NC, level=level,
                             chunk=chunk)
    grid = (B, NBP // chunk)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, 2 * NC), lambda b, c: (b, c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, EHP, SP), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EHP, SP), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (1, 1, NBP) blocks: the last two dims equal the array dims, which
        # satisfies the TPU block-tiling rule; all chunk steps of a batch
        # element revisit the same block, so it flushes once per b.
        out_specs=[
            pl.BlockSpec((1, 1, NBP), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, 1, NBP), jnp.int32)] * 3,
        interpret=interpret,
    )


def refine_level_pallas(src2d, ref2d, cmx, cmy, layout: FrameLayout,
                        level: int, blk_w: int, blk_h: int, nbh_l: int,
                        nb: int, interpret: bool = False):
    """Batched candidate+9pt refine.

    src2d/ref2d: (B, EH, S) u8 extended level planes.
    cmx/cmy: (B, nb, NC) i32 candidate MVs (full-res units).
    Returns (dx, dy, best) as (B, nb) i32 (level units).
    """
    B, EH, S = src2d.shape
    NC = cmx.shape[-1]
    p = layout.planes[0]
    chunk = _chunk_of(nb)
    NBP = -(-nb // chunk) * chunk
    if NBP != nb:
        padw = ((0, 0), (0, NBP - nb), (0, 0))
        cmx = jnp.pad(cmx, padw)
        cmy = jnp.pad(cmy, padw)
    cm = jnp.concatenate([cmx, cmy], axis=-1).astype(jnp.int32)
    # spare rows/lanes so every aligned superset load stays in bounds
    EHP = ((EH + 7) & ~7) + 16
    SP = S + 256
    rp = ((0, 0), (0, EHP - EH), (0, SP - S))
    src2d = jnp.pad(src2d, rp)
    ref2d = jnp.pad(ref2d, rp)
    call = _build_call(B, NBP, EH, EHP, S, SP, p.ext, p.w, p.h, nbh_l,
                       blk_w, blk_h, NC, level, chunk, interpret)
    dx, dy, best = call(cm, src2d, ref2d)
    return (dx[:, 0, :nb], dy[:, 0, :nb], best[:, 0, :nb])


# ---------------------------------------------------------------- level 0
# Half-pel search-point tables (hme.c:27-30,543-597) — must match
# ops/hme.py XH/YH. Decomposed per point into the static full-pel window
# origin offset (xh >> 1, yh >> 1) and half-pel phase (xh & 1, yh & 1):
# X = 2*(cx+dx) + xh  =>  X >> 1 = (cx+dx) + (xh >> 1), X & 1 = xh & 1.
XH = (1, -1, 0, 0, -1, 1, -1, 1)
YH = (0, 0, 1, -1, -1, -1, 1, 1)
HP = 14      # HP_SAD_SZ
NB_W = 24    # half-pel neighbourhood load (>= HP + 2 origin + 3 taps)

# flag bit layout of the base kernel's `flags` output
FLAG_GO_INTRA = 1   # luma intra-cascade verdict (chroma term added in XLA)
FLAG_NOT_INTRA = 2  # block_intra_test says the block can't survive intra
FLAG_LO_TEX = 4
FLAG_LO_VAR = 8
FLAG_HP_HIT = 16


# Mosaic has no unsigned reductions/div, but two's-complement int32
# addition/multiplication wrap bit-identically to uint32, so the
# reference's u32 math runs on int32 bit patterns with explicit
# unsigned division / comparison where the interpretation matters.


def _udiv(a, b):
    """Unsigned a // b on int32 bit patterns (b positive, small)."""
    half = jax.lax.shift_right_logical(a, 1)
    q = 2 * jax.lax.div(half, b)
    r = a - q * b  # in [0, 2b): exact despite a's wrap
    return q + (r >= b).astype(jnp.int32)


def _ugt(a, b):
    """Unsigned a > b on int32 bit patterns (sign-bit flip trick)."""
    m = jnp.int32(-2**31)
    return (a ^ m) > (b ^ m)


def _texture14(a):
    """block_texture (hme.c:180-210) on a 14x14 int32 window in VMEM.

    Returns (tex, avg, var) int32 scalars; var carries the reference's
    u32 wrap bit pattern (s*s wraps for bright windows)."""
    s = jnp.sum(a)                      # <= 255*196, no wrap
    ss = jnp.sum(a * a)                 # <= 12.7M, no wrap
    sh = jnp.sum(jnp.abs(a[:, 1:] - a[:, :-1]))
    sv = jnp.sum(jnp.abs(a[1:, :] - a[:-1, :]))
    n = jnp.int32(HP * HP)
    tex = jax.lax.div(jax.lax.div(sh + sv, jnp.int32(2)), n)
    avg = jax.lax.div(s, n)
    var = ss - _udiv(s * s, n)          # s*s wraps like the C's u32
    return tex, avg, var


def _base_kernel(cm_ref, src_ref, ref_ref, mvx_ref, mvy_ref, flags_ref,
                 qbits_ref, ltex_ref, svar_ref, *, EH: int, S: int, E: int,
                 w: int, h: int, nbh_l: int, BW: int, BH: int, NC: int,
                 chunk: int, banded: bool = False):
    """Level-0 kernel: candidate select + 9-point full-pel + 8-point
    half-pel refine + the whole luma HVS intra cascade (hme.c:543-722),
    per block, with both planes resident in VMEM.

    Replaces the XLA refine_base's half-pel variant planes, the batched
    variant-window gathers and the per-block window fetches (zero-MV,
    quadrant, 14x14 centre) — measured ~55 ms of an 11-frame 1080p GOP's
    92 ms HME. Chroma variance (hme.c:667-682) needs the chroma planes
    and stays in XLA; its cascade term ORs into FLAG_GO_INTRA there.

    banded=True is the large-plane (4K+) mode: both planes resident
    blow the VMEM budget (2 x ~9.7 MB at 4K vs ~16 MB), but the kernel
    reads the SOURCE plane only at block-origin windows (srcw and the
    14x14 half-pel centre — the zero-MV / candidate / half-pel windows
    all come from REF), so REF stays fully resident while SRC arrives
    as one (BH+32)-row band per block row via the grid: grid
    (B, nbv, row-chunks), src block (1, 1, BAND_H, SP) indexed by the
    row, band j covering plane rows [E + j*BH - 16, E + j*BH + BH + 16)
    (margins for the centre window's sublane alignment).
    """
    if banded:
        gj_b = pl.program_id(1)
        c = pl.program_id(2)
    else:
        c = pl.program_id(1)
    imax = jnp.int32(2**31 - 1)
    b = FRAME_BORDER
    cols = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    load = _load

    def body(i, _):
        if banded:
            gi = c * chunk + i
            gj = gj_b
            t = gj * nbh_l + gi
        else:
            t = c * chunk + i
            gi = jax.lax.rem(t, nbh_l)
            gj = jax.lax.div(t, nbh_l)
        bx = gi * BW
        by = gj * BH
        inframe = (bx < w) & (by < h)
        bw_c = jnp.clip(w - bx, 0, BW)
        bh_c = jnp.clip(h - by, 0, BH)
        colm = cols < bw_c
        rowm = rows < bh_c
        if banded:
            # band-local rows: band j starts at plane row E + j*BH - 16,
            # so the block origin E + by sits at constant local row 16
            srcw = load(src_ref, jnp.int32(16),
                        jnp.clip(E + bx, 0, S - BW), BH, BW,
                        aligned=True, lead=(0, 0))
        else:
            # & ~7 keeps the block-origin row alignment under the clamp
            srcw = load(src_ref, jnp.clip(E + by, 0, (EH - BH) & ~7),
                        jnp.clip(E + bx, 0, S - BW), BH, BW, aligned=True)

        # --- candidate SADs (hme.c:452-510)
        bsad = imax
        bk = jnp.int32(0)
        for k in range(NC):
            mx = cm_ref[0, i, k]
            my = cm_ref[0, i, NC + k]
            rx = bx + mx
            ry = by + my
            ok = ((rx >= -b) & (ry >= -b) & (rx + bw_c <= w + b)
                  & (ry + bh_c <= h + b) & inframe)
            refw = load(ref_ref, jnp.clip(E + ry, 0, EH - BH),
                        jnp.clip(E + rx, 0, S - BW), BH, BW)
            sad = jnp.where(ok, _masked_sad(srcw, refw, colm, rowm), imax)
            take = sad < bsad
            bk = jnp.where(take, jnp.int32(k), bk)
            bsad = jnp.where(take, sad, bsad)
        bdx = jnp.int32(0)
        bdy = jnp.int32(0)
        for k in range(NC):
            sel = bk == k
            bdx = jnp.where(sel, cm_ref[0, i, k], bdx)
            bdy = jnp.where(sel, cm_ref[0, i, NC + k], bdy)
        bdx = jnp.clip(bdx, -bw_c - bx, w - bx)
        bdy = jnp.clip(bdy, -bh_c - by, h - by)

        # --- 9-point refine (hme.c:526-541)
        rr = jnp.clip(E + by + bdy - 1, 0, EH - (BH + 2))
        cc = jnp.clip(E + bx + bdx - 1, 0, S - (BW + 2))
        padw = load(ref_ref, rr, cc, BH + 2, BW + 2)
        best = imax
        m9 = jnp.int32(0)
        for k in range(9):
            oy, ox = YF[k] + 1, XF[k] + 1
            sad = _masked_sad(srcw, padw[oy:oy + BH, ox:ox + BW], colm,
                              rowm)
            take = sad < best
            m9 = jnp.where(take, jnp.int32(k), m9)
            best = jnp.where(take, sad, best)
        ox9 = jnp.int32(0)
        oy9 = jnp.int32(0)
        for k in range(9):
            sel = m9 == k
            ox9 = jnp.where(sel, jnp.int32(XF[k]), ox9)
            oy9 = jnp.where(sel, jnp.int32(YF[k]), oy9)
        dx = bdx + ox9
        dy = bdy + oy9

        # --- half-pel refine (hme.c:543-597 / ops/hme.py refine_base)
        yarea = (bw_c * bh_c).astype(jnp.int32)
        yareasq = yarea * yarea  # <= 4096^2, no wrap
        cx = bx + (bw_c >> 1) - HP // 2
        cy = by + (bh_c >> 1) - HP // 2
        if banded:
            # local row = (E + cy) - (E + by - 16) = (bh_c >> 1) + 9;
            # in [9, BH/2 + 9], superset stays inside the BH+32 band
            srcw14 = load(src_ref, (bh_c >> 1) + jnp.int32(9),
                          jnp.clip(E + cx, 0, S - HP), HP, HP,
                          lead=(0, 0))
        else:
            srcw14 = load(src_ref, jnp.clip(E + cy, 0, EH - HP),
                          jnp.clip(E + cx, 0, S - HP), HP, HP)

        # one (NB_W, NB_W) neighbourhood at (cy+dy-2, cx+dx-2) covers all
        # eight half-pel windows and their 4-tap supports
        A = cx + dx
        Bc = cy + dy
        nb_ = load(ref_ref, jnp.clip(E + Bc - 2, 0, EH - NB_W),
                   jnp.clip(E + A - 2, 0, S - NB_W), NB_W, NB_W)
        # D.1.1 luma half-pel filters (bmc.c:112-174), 2-D window form
        h8 = jnp.clip((9 * (nb_[:, 1:-2] + nb_[:, 2:-1])
                       - (nb_[:, :-3] + nb_[:, 3:]) + 8) >> 4, 0, 255)
        v8 = jnp.clip((9 * (nb_[1:-2, :] + nb_[2:-1, :])
                       - (nb_[:-3, :] + nb_[3:, :]) + 8) >> 4, 0, 255)
        hu = (9 * (nb_[:, 1:-2] + nb_[:, 2:-1])
              - (nb_[:, :-3] + nb_[:, 3:]))
        d8 = jnp.clip((9 * (hu[1:-2, :] + hu[2:-1, :])
                       - (hu[:-3, :] + hu[3:, :]) + 128) >> 8, 0, 255)
        # index maps into the trimmed grids: a0/v8 keep full columns,
        # h8/d8 lose 1 leading column; v8/d8 lose 1 leading row. Window
        # origin in nb_ coords is (2 + (yh>>1), 2 + (xh>>1)).

        def hp_window(k):
            xh, yh = XH[k], YH[k]
            r0 = 2 + (yh >> 1)
            c0 = 2 + (xh >> 1)
            phx, phy = xh & 1, yh & 1
            if phx and phy:
                return d8[r0 - 1:r0 - 1 + HP, c0 - 1:c0 - 1 + HP]
            if phx:
                return h8[r0:r0 + HP, c0 - 1:c0 - 1 + HP]
            if phy:
                return v8[r0 - 1:r0 - 1 + HP, c0:c0 + HP]
            return nb_[r0:r0 + HP, c0:c0 + HP]  # pragma: no cover

        do_hp = (best > BW * BH) & inframe
        best_hp0 = jax.lax.div(best * (HP * HP), jnp.maximum(yarea, 1))
        run_best = best_hp0
        run_m = jnp.int32(-1)
        wins = []
        for k in range(8):
            wk = hp_window(k)
            wins.append(wk)
            s = jnp.sum(jnp.abs(srcw14 - wk))
            take = s < run_best
            run_m = jnp.where(take, jnp.int32(k), run_m)
            run_best = jnp.where(take, s, run_best)
        hp_hit = do_hp & (run_m >= 0)
        mvx = jnp.int32(dx << 1)
        mvy = jnp.int32(dy << 1)
        for k in range(8):
            sel = hp_hit & (run_m == k)
            mvx = jnp.where(sel, (dx << 1) + XH[k], mvx)
            mvy = jnp.where(sel, (dy << 1) + YH[k], mvy)
        best = jnp.where(
            hp_hit, jax.lax.div(run_best * yarea, jnp.int32(HP * HP)),
            best)

        # --- refblock stats: centre window of the chosen prediction.
        # Select the winning window FIRST (8 selects of a 14x14), then
        # run block_texture once — vs 9 full _texture14 evaluations
        # whose results all but one are discarded.
        selw = nb_[2:2 + HP, 2:2 + HP]
        for k in range(8):
            sel = hp_hit & (run_m == k)
            selw = jnp.where(sel, wins[k], selw)
        rtex, ravg, rvar = _texture14(selw)
        stex, savg, svar = _texture14(srcw14)

        # --- block metrics + intra cascade (hme.c:598-716); u32 wrap
        # reproduced on int32 bit patterns (see _udiv/_ugt)
        mm = (colm & rowm).astype(jnp.int32)
        sm = srcw * mm
        s_sum = jnp.sum(sm)              # <= 255*4096, no wrap
        s_ss = jnp.sum(sm * sm)          # <= 266M, no wrap
        # gradient masks (hme.c:212-245 via ops/hme.py _block_analysis):
        # dh element j = |a[j]-a[j-1]| masked by 1 <= j < bw_c; dv
        # element i = |a[i]-a[i-1]| masked by 1 <= i < bh_c. Expressed
        # with rolls on the FULL (BH, BW) shape: reducing an odd-sliced
        # iota-masked product crashes the Mosaic compiler (verified:
        # `limits[i] <= dim(i)` check failure).
        dh_ = jnp.abs(srcw - pltpu.roll(srcw, 1, axis=1)) \
            * ((cols >= 1) & colm & rowm).astype(jnp.int32)
        dv_ = jnp.abs(srcw - pltpu.roll(srcw, 1, axis=0)) \
            * ((rows >= 1) & colm & rowm).astype(jnp.int32)
        sh_ = jnp.sum(dh_)
        sv_ = jnp.sum(dv_)
        area = jnp.maximum(yarea, 1)
        luma_tex = jax.lax.div(jax.lax.div(sh_ + sv_, jnp.int32(2)), area)
        # s_sum^2 wraps like the reference's u32; unsigned div/compare
        luma_var = s_ss - _udiv(s_sum * s_sum, area)
        lo_tex = (luma_tex <= 2) & inframe
        lo_var = _ugt(yareasq, luma_var) & inframe

        # zero-MV window: zvar + block_intra_test (hme.c:143-178,653)
        zerow = load(ref_ref, jnp.clip(E + by, 0, (EH - BH) & ~7),
                     jnp.clip(E + bx, 0, S - BW), BH, BW, aligned=True)
        zu = zerow * mm
        z_s = jnp.sum(zu)
        z_ss = jnp.sum(zu * zu)
        zvar = z_ss - _udiv(z_s * z_s, area)
        ravg0 = jax.lax.div(z_s, area)
        inner = jnp.clip(srcw - ravg0 + 128, 0, 255)
        dif0 = jnp.clip(ravg0 + inner - 128, 0, 255)
        not_intra = jnp.sum(((dif0 != srcw) & colm & rowm)
                            .astype(jnp.int32)) > 0

        go_intra = (
            ((stex < 2) & _ugt(zvar, luma_var * 2))
            | (rvar > svar * 2)
            | ((stex == 0) & (rtex != 0))
            | (jnp.abs(savg - ravg) > 8)
            | ((luma_tex <= 10)
               & (best > jax.lax.div(yareasq, jnp.int32(16)))))

        # --- sub-block intra metric (hme.c:89-134,684-712).
        # The four (sbh, sbw) quadrant windows of src and zero-MV ref
        # are sub-rectangles of the already-loaded srcw/zerow (quadrant
        # q spans rows [qy*sbh, (qy+1)*sbh) cols [qx*sbw, (qx+1)*sbw)
        # of the block), so the per-pixel fields are computed ONCE on
        # the full (BH, BW) block and each quadrant reduces under its
        # rectangle mask — replacing 16 window loads per block.
        sbw = bw_c // 2
        sbh = bh_c // 2
        dif_f = jnp.abs(srcw - zerow)
        ngood_f = jnp.where(dif_f == 0, 192,
                            jnp.where(dif_f == 1, 128,
                                      jnp.where(dif_f == 2, 96, 0)))
        nevil_f = jnp.where(dif_f > 2, dif_f, 0)
        # gradient fields: element (i, j) holds |a[j]-a[j-1]| at the
        # block-absolute position; a quadrant's local-j>=1 mask selects
        # exactly its in-quadrant differences (the j-1 neighbour of a
        # local j>=1 stays inside the quadrant)
        gh_f = (jnp.abs(srcw - pltpu.roll(srcw, 1, axis=1))
                + jnp.abs(zerow - pltpu.roll(zerow, 1, axis=1)))
        gv_f = (jnp.abs(srcw - pltpu.roll(srcw, 1, axis=0))
                + jnp.abs(zerow - pltpu.roll(zerow, 1, axis=0)))
        qb = jnp.int32(0)
        ethr = (sbw + sbh) >> 1
        for qy in (0, 1):
            for qx in (0, 1):
                lcol = cols - qx * sbw
                lrow = rows - qy * sbh
                qm_b = ((lcol >= 0) & (lcol < sbw)
                        & (lrow >= 0) & (lrow < sbh))
                qm = qm_b.astype(jnp.int32)
                # all nonneg and << 2^31: plain int32 sums/compares
                good = (jnp.sum(ngood_f * qm)
                        + jnp.sum(gh_f * (qm_b & (lcol >= 1))
                                  .astype(jnp.int32))
                        + jnp.sum(gv_f * (qm_b & (lrow >= 1))
                                  .astype(jnp.int32)))
                evil = jnp.sum(nevil_f * qm)
                good4 = good >= ethr * evil
                clear = (stex > 1) & good4
                qb = qb | jnp.where(clear,
                                    jnp.int32(1 << (qy * 2 + qx)), 0)

        flags = (jnp.where(go_intra, FLAG_GO_INTRA, 0)
                 | jnp.where(not_intra, FLAG_NOT_INTRA, 0)
                 | jnp.where(lo_tex, FLAG_LO_TEX, 0)
                 | jnp.where(lo_var, FLAG_LO_VAR, 0)
                 | jnp.where(hp_hit, FLAG_HP_HIT, 0))
        mvx_ref[0, 0, t] = mvx
        mvy_ref[0, 0, t] = mvy
        flags_ref[0, 0, t] = flags
        qbits_ref[0, 0, t] = qb
        ltex_ref[0, 0, t] = luma_tex.astype(jnp.int32)
        svar_ref[0, 0, t] = svar
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.lru_cache(maxsize=32)
def _build_base_call(B: int, NBP: int, EH: int, EHP: int, S: int, SP: int,
                     E: int, w: int, h: int, nbh_l: int, BW: int, BH: int,
                     NC: int, chunk: int, interpret: bool):
    kern = functools.partial(_base_kernel, EH=EH, S=S, E=E, w=w, h=h,
                             nbh_l=nbh_l, BW=BW, BH=BH, NC=NC, chunk=chunk)
    grid = (B, NBP // chunk)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, 2 * NC), lambda b, c: (b, c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, EHP, SP), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EHP, SP), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NBP), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ] * 6,
        out_shape=[jax.ShapeDtypeStruct((B, 1, NBP), jnp.int32)] * 6,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _build_base_call_banded(B: int, nbv: int, NBH_P: int, EH: int,
                            EHP: int, S: int, SP: int, E: int, w: int,
                            h: int, nbh_l: int, BW: int, BH: int, NC: int,
                            chunk: int, interpret: bool):
    """4K+ variant: REF resident, SRC as one band per block row (see
    _base_kernel banded docstring)."""
    BAND_H = BH + 32
    # nbh_l=NBH_P: banded output rows are NBH_P wide (per-row padding),
    # so the kernel's t = gj*nbh_l + gi must stride by NBH_P; padded
    # gi >= real nbh land out of frame and are sliced off by the caller
    kern = functools.partial(_base_kernel, EH=EH, S=S, E=E, w=w, h=h,
                             nbh_l=NBH_P, BW=BW, BH=BH, NC=NC, chunk=chunk,
                             banded=True)
    CB = NBH_P // chunk
    grid = (B, nbv, CB)
    NBP = nbv * NBH_P
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, 2 * NC),
                         lambda b, j, c, CB=CB: (b, j * CB + c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, BAND_H, SP), lambda b, j, c: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EHP, SP), lambda b, j, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NBP), lambda b, j, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ] * 6,
        out_shape=[jax.ShapeDtypeStruct((B, 1, NBP), jnp.int32)] * 6,
        interpret=interpret,
    )


def refine_base_pallas(src2d, ref2d, cmx, cmy, layout: FrameLayout,
                       blk_w: int, blk_h: int, nbh_l: int, nb: int,
                       interpret: bool = False,
                       banded: bool | None = None):
    """Level-0 search + luma HVS cascade in one kernel (see _base_kernel).

    Returns per-block (B, nb) int32 arrays:
    (mvx, mvy, flags, qbits, luma_tex, src_var).

    Planes larger than MAX_PLANE_BYTES (4K+) run the banded variant:
    REF resident in VMEM, SRC streamed per block row. banded=None
    auto-selects by plane size; tests pass True to arbitrate the banded
    path on small planes in interpret mode.
    """
    B, EH, S = src2d.shape
    NC = cmx.shape[-1]
    p = layout.planes[0]
    EHP = ((EH + 7) & ~7) + 16
    SP = S + 256
    rp = ((0, 0), (0, EHP - EH), (0, SP - S))
    if banded is None:
        banded = EHP * SP > MAX_PLANE_BYTES
    if not banded:
        chunk = _chunk_of(nb)
        NBP = -(-nb // chunk) * chunk
        if NBP != nb:
            padw = ((0, 0), (0, NBP - nb), (0, 0))
            cmx = jnp.pad(cmx, padw)
            cmy = jnp.pad(cmy, padw)
        cm = jnp.concatenate([cmx, cmy], axis=-1).astype(jnp.int32)
        src2d = jnp.pad(src2d, rp)
        ref2d = jnp.pad(ref2d, rp)
        call = _build_base_call(B, NBP, EH, EHP, S, SP, p.ext, p.w, p.h,
                                nbh_l, blk_w, blk_h, NC, chunk, interpret)
        outs = call(cm, src2d, ref2d)
        return tuple(o[:, 0, :nb] for o in outs)

    nbv = nb // nbh_l
    chunk = _chunk_of(nbh_l)
    NBH_P = -(-nbh_l // chunk) * chunk
    E = p.ext
    BH = blk_h
    BAND_H = BH + 32
    # per-row candidate padding nbh_l -> NBH_P
    cmr = [a.reshape(B, nbv, nbh_l, NC) for a in (cmx, cmy)]
    if NBH_P != nbh_l:
        cmr = [jnp.pad(a, ((0, 0), (0, 0), (0, NBH_P - nbh_l), (0, 0)))
               for a in cmr]
    cm = jnp.concatenate(cmr, axis=-1).astype(jnp.int32) \
        .reshape(B, nbv * NBH_P, 2 * NC)
    src2d = jnp.pad(src2d, rp)
    ref2d = jnp.pad(ref2d, rp)
    # band j covers plane rows [E + j*BH - 16, E + j*BH + BH + 16)
    bands = jnp.stack(
        [jax.lax.slice(src2d, (0, E + j * BH - 16, 0),
                       (B, E + j * BH - 16 + BAND_H, SP))
         for j in range(nbv)], axis=1)            # (B, nbv, BAND_H, SP)
    # B stays OUT of the pallas grid (lax.map of B=1 calls): a batched
    # grid's REF block changes with b, and Mosaic double-buffers the
    # incoming block across grid transitions — 2 x 9.7 MB at 4K blows
    # VMEM. With b fixed the (0, 0, 0) index is a pure revisit: one
    # resident buffer.
    call = _build_base_call_banded(1, nbv, NBH_P, EH, EHP, S, SP, E,
                                   p.w, p.h, nbh_l, blk_w, blk_h, NC,
                                   chunk, interpret)

    def one(args):
        cm1, band1, ref1 = args
        return call(cm1[None], band1[None], ref1[None])

    outs = jax.lax.map(one, (cm, bands, ref2d))
    return tuple(o.reshape(B, nbv, NBH_P)[:, :, :nbh_l]
                 .reshape(B, nb) for o in outs)
