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

CHUNK = 128  # blocks per grid step

# VMEM budget guard: src+ref planes x2 (pallas double-buffers blocks).
# Above this (4K luma ~9.4MB) fall back to the XLA path.
MAX_PLANE_BYTES = 4 << 20


def use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _masked_sad(a, b, colm, rowm):
    d = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
    return jnp.sum(jnp.where(colm & rowm, d, 0))


def _refine_kernel(cm_ref, src_ref, ref_ref, dx_ref, dy_ref, best_ref, *,
                   EH: int, S: int, E: int, w: int, h: int, nbh_l: int,
                   BW: int, BH: int, NC: int, level: int):
    """One grid step: CHUNK blocks of one batch element.

    cm_ref: SMEM (1, CHUNK, 2*NC) i32 candidate MVs in full-res units
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

    def load(ref, rr, cc, H_: int, W_: int):
        """(H_, W_) i32 window at dynamic (rr, cc).

        Mosaic requires provably aligned vector-load starts (8 sublanes /
        128 lanes), so load the aligned superset and dynamic-rotate it
        into place (the wrapper pads the planes by 8 rows / 128 lanes so
        the superset always stays in bounds)."""
        r8 = pl.multiple_of(rr & ~7, 8)
        c128 = pl.multiple_of(cc & ~127, 128)
        # the lane rotate needs a %8 x %128 vector shape
        RH = ((H_ + 8 + 7) // 8) * 8
        LW = ((W_ + 128 + 127) // 128) * 128
        big = ref[0, pl.ds(r8, RH), pl.ds(c128, LW)].astype(jnp.int32)
        big = pltpu.roll(big, -(cc - c128), axis=1)
        # row alignment: dynamic sublane rotate miscompiles on real TPUs
        # (rotates within 8-row tiles; verified), so select among the 8
        # statically shifted views instead
        off = rr - r8
        win = big[0:H_]
        for o in range(1, 8):
            win = jnp.where(off == o, big[o:o + H_], win)
        return win[:, :W_]

    def body(i, _):
        t = c * CHUNK + i
        gi = jax.lax.rem(t, nbh_l)
        gj = jax.lax.div(t, nbh_l)
        bx = gi * BW
        by = gj * BH
        inframe = (bx < w) & (by < h)
        bw_c = jnp.clip(w - bx, 0, BW)
        bh_c = jnp.clip(h - by, 0, BH)
        colm = cols < bw_c
        rowm = rows < bh_c
        # clamps keep grid-padding blocks (t >= nb, discarded) in bounds
        srcw = load(src_ref, jnp.clip(E + by, 0, EH - BH),
                    jnp.clip(E + bx, 0, S - BW), BH, BW)

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

    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.lru_cache(maxsize=64)
def _build_call(B: int, NBP: int, EH: int, EHP: int, S: int, SP: int,
                E: int, w: int, h: int, nbh_l: int, BW: int, BH: int,
                NC: int, level: int, interpret: bool):
    kern = functools.partial(_refine_kernel, EH=EH, S=S, E=E, w=w, h=h,
                             nbh_l=nbh_l, BW=BW, BH=BH, NC=NC, level=level)
    grid = (B, NBP // CHUNK)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CHUNK, 2 * NC), lambda b, c: (b, c, 0),
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
    NBP = -(-nb // CHUNK) * CHUNK
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
                       blk_w, blk_h, NC, level, interpret)
    dx, dy, best = call(cm, src2d, ref2d)
    return (dx[:, 0, :nb], dy[:, 0, :nb], best[:, 0, :nb])
