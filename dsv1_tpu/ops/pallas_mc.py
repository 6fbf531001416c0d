"""Pallas TPU kernel for block motion compensation (prediction build).

Why a kernel: the XLA compensate_plane lowers to ~150 device ops per
plane (span-gather chunks, one-hot alignment contractions, integral
images, per-quadrant selects) and the chunk executable is op-dispatch
bound — 1080p luma compensate measures 1.14 ms of mostly ~10 us ops.
Here the four half-pel variant planes sit resident in VMEM (the phase
values are PRE-COMPUTED by the existing flat-index XLA filters, so the
reference's row-crossing tap semantics at the plane edge are preserved
bit-exactly — see bmc.hpel_variants_luma), one grid step walks a block
row, and each block's window fetch + intra DC fills + mode select run
on-chip in a single fused program (reference compensate,
bmc.c:204-302).

Gating: the variants stack must fit VMEM (4 x ext plane; ~11.3 MB for
1080p luma). 4K planes (4 x 9.7 MB) fall back to the XLA path — at 4K
the chunk is compute-dominated elsewhere, and correctness is identical.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_hme import _load, _udiv

# VMEM budget for the resident (4, EHP, SP) variants stack
MAX_VAR_BYTES = 13 << 20

CHUNK = 128  # max blocks per grid step (shrunk for narrow grids)

# tests force interpret mode so the kernel arbitrates on CPU CI
INTERPRET = False


def _mc_kernel(bm_ref, var_ref, out_ref, *, EH: int, S: int, E: int,
               w: int, h: int, NBH_P: int, BW: int, BH: int, chunk: int):
    """One grid step: `chunk` blocks of block row j.

    bm_ref: SMEM (1, chunk, 6) i32 per-block
            [mode, submask, inter_r, inter_c, phase, unused]
            (inter_r/c are the clamped absolute window origins in the
            extended plane, precomputed in XLA — bmc.c:241-255).
    var_ref: VMEM (4, EHP, SP) u8 resident variant planes (phase 0 is
             the unfiltered reference plane).
    out_ref: VMEM (1, chunk, BH, BW) u8 — one cell per block (dynamic
             stores at arbitrary lane offsets are not lowerable, so the
             blocks-of-a-row raster is assembled by a cheap XLA
             transpose+reshape in the wrapper instead).
    """
    j = pl.program_id(0)
    c = pl.program_id(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)

    def body(i, _):
        gi = c * chunk + i
        bx = gi * BW
        by = j * BH
        bw_c = jnp.clip(w - bx, 0, BW)
        bh_c = jnp.clip(h - by, 0, BH)
        mode = bm_ref[0, i, 0]
        sub = bm_ref[0, i, 1]
        # --- inter window: one dynamic fetch from the phase plane
        ir = bm_ref[0, i, 2]
        ic = bm_ref[0, i, 3]
        ph_i = bm_ref[0, i, 4]
        inter = _load(var_ref, jnp.clip(ir, 0, EH - BH),
                      jnp.clip(ic, 0, S - BW), BH, BW, lead=(ph_i,))

        # --- intra fills (bmc.c:256-298) from the zero-MV window
        zerow = _load(var_ref, jnp.clip(E + by, 0, (EH - BH) & ~7),
                      jnp.clip(E + bx, 0, S - BW), BH, BW,
                      aligned=True, lead=(jnp.int32(0),))
        m = ((cols < bw_c) & (rows < bh_c)).astype(jnp.int32)
        zs = zerow * m
        area = jnp.maximum(bw_c * bh_c, 1)
        # u32 semantics match _block_avgs (sums < 2^31 here: <= 255*4096)
        avg_full = jax.lax.div(jnp.sum(zs), area)
        sbw = bw_c // 2
        sbh = bh_c // 2
        sarea = jnp.maximum(sbw * sbh, 1)
        lx = cols - (cols >= sbw) * sbw   # local col within quadrant
        ly = rows - (rows >= sbh) * sbh
        qx = (cols >= sbw).astype(jnp.int32)
        qy = (rows >= sbh).astype(jnp.int32)
        qavg = jnp.int32(0) * cols
        for qy_ in (0, 1):
            for qx_ in (0, 1):
                qm = ((qx == qx_) & (qy == qy_)
                      & (lx < sbw) & (ly < sbh)).astype(jnp.int32)
                s_ = jax.lax.div(jnp.sum(zs * qm), sarea)
                qavg = qavg + s_ * qm
        in_sub = (lx < sbw) & (ly < sbh) & (sbw > 0) & (sbh > 0) \
            & ((cols < 2 * sbw) & (rows < 2 * sbh))
        mask_bit = ((sub >> (qy * 2 + qx)) & 1) == 1
        intra = jnp.where(sub == 15, avg_full,
                          jnp.where(~in_sub, 0,
                                    jnp.where(mask_bit, qavg, zerow)))
        pred = jnp.where(mode == 1, inter, intra)
        out_ref[0, pl.ds(i, 1)] = pred.astype(jnp.uint8)[None]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.lru_cache(maxsize=32)
def _build_mc_call(nbv: int, NBH_P: int, EH: int, EHP: int, S: int,
                   SP: int, E: int, w: int, h: int, BW: int, BH: int,
                   chunk: int, interpret: bool):
    kern = functools.partial(_mc_kernel, EH=EH, S=S, E=E, w=w, h=h,
                             NBH_P=NBH_P, BW=BW, BH=BH, chunk=chunk)
    CB = NBH_P // chunk
    grid = (nbv, CB)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, 6),
                         lambda j, c, CB=CB: (j * CB + c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, EHP, SP), lambda j, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, BH, BW),
                               lambda j, c, CB=CB: (j * CB + c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbv * CB, chunk, BH, BW),
                                       jnp.uint8),
        interpret=interpret,
    )


def mc_supported(layout, c: int) -> bool:
    """Does the resident variants stack fit the VMEM budget?"""
    p = layout.planes[c]
    EH = p.h + 2 * p.ext
    EHP = ((EH + 7) & ~7) + 16
    return 4 * EHP * (p.stride + 256) <= MAX_VAR_BYTES


def compensate_plane_pallas(vflat, layout, c: int, bw: int, bh: int,
                            nbh: int, nbv: int, modes, px, py0, phase,
                            submask, interpret: bool = False):
    """Prediction plane via the MC kernel.

    vflat: (4n,) u8 precomputed variant planes in flat image space
    (bmc.hpel_variants_*). px/py0: per-block clamped window origins in
    plane coords; phase: half-pel phase per block. Returns (ph, pw) u8.
    """
    from .frame import flat_base

    p = layout.planes[c]
    n = vflat.shape[0] // 4
    EH = p.h + 2 * p.ext
    S = p.stride
    start = flat_base(layout, c) - p.ext * S - p.ext
    # (4, EH, S) region views of the flat variants — reshape of a
    # contiguous slice, so the row-crossing tap values computed by the
    # flat-index filters are preserved exactly
    var = jnp.stack([
        jax.lax.dynamic_slice(vflat, (k * n + start,), (EH * S,))
        .reshape(EH, S) for k in range(4)])
    EHP = ((EH + 7) & ~7) + 16
    SP = S + 256
    var = jnp.pad(var, ((0, 0), (0, EHP - EH), (0, SP - S)))

    chunk = min(CHUNK, ((nbh + 7) // 8) * 8)
    NBH_P = -(-nbh // chunk) * chunk

    bm = jnp.stack([
        modes.reshape(nbv, nbh).astype(jnp.int32),
        submask.reshape(nbv, nbh).astype(jnp.int32),
        (py0 + p.ext).reshape(nbv, nbh).astype(jnp.int32),
        (px + p.ext).reshape(nbv, nbh).astype(jnp.int32),
        phase.reshape(nbv, nbh).astype(jnp.int32),
        jnp.zeros((nbv, nbh), jnp.int32),
    ], axis=-1)                                   # (nbv, nbh, 6)
    if NBH_P != nbh:
        bm = jnp.pad(bm, ((0, 0), (0, NBH_P - nbh), (0, 0)))
    bm = bm.reshape(nbv * (NBH_P // chunk), chunk, 6)
    call = _build_mc_call(nbv, NBH_P, EH, EHP, S, SP, p.ext, p.w, p.h,
                          bw, bh, chunk, interpret or INTERPRET)
    out = call(bm, var)             # (nbv*CB, chunk, BH, BW) block cells
    out = out.reshape(nbv, NBH_P, bh, bw)[:, :nbh]
    return out.transpose(0, 2, 1, 3).reshape(nbv * bh, nbh * bw) \
        [:p.h, :p.w]
