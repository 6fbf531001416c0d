"""Subband (wavelet) transforms — integer-exact, fully vectorized.

DSV1 uses a full multiresolution decomposition down to 1px: per level a 2D
Haar into LL/LH/HL/HH quadrants (reference sbt.c:267-349) with truncating
4/5 LL scaling on selected levels, plus a biorthogonal 4-tap transform (B4T)
for level 1 of intra frames (sbt.c:90-265). The inverse for luma applies a
smoothing filter that nudges LH/HL toward the local LL gradient bounded by
±hqp (sbt.c:437-574).

TPU-native design: the reference's in-place scalar loops with a global temp
buffer become pure functions over (H, W) int32 arrays. Each level is a
static-shaped slice -> strided elementwise compute -> slice write; the level
loop unrolls at trace time (≈log2(max(W,H)) levels, each level 1/4 the work
of the previous). Odd dimensions are handled by edge-replication (forward)
and zero-padding (inverse), which reproduces the reference's odd-row/col
special cases exactly.

Bit-exactness notes:
- C truncating division via lax.div (ops/cint.py), validated against the C.
- The filtered inverse reads LL neighbours across quadrant boundaries
  (sbt.c:480-510 reads spLL[idx+1] past the LL quadrant); we slice from the
  full array rows/cols so those cross-quadrant reads match.
- B4T is implemented for even dimensions (all real video sizes; the
  reference's odd-dim B4T writes a gap at index n//2+1 that reads stale
  temp-buffer memory — undefined behavior we do not reproduce).
"""

import jax.numpy as jnp

from ..constants import MAXLVL, MINQUANT, QP_I, QP_P, round_shift
from .cint import lb2, lb2_static, round2, round4, round8, trunc_div


def nlevels(w: int, h: int) -> int:
    """C.3.3 num_levels (sbt.c:616-628)."""
    return lb2_static(max(w, h))


def get_quant(q, is_p, level):
    """C.2.2 get_quant_lower_frequency (hzcc.c:77-92). q and is_p may be
    traced (a python-bool is_p constant-folds to the same HLO)."""
    q = jnp.asarray(q, jnp.int32)
    q = jnp.where(is_p, trunc_div(q * 3, 2), q)
    if isinstance(level, int):
        if level == 1:
            q = trunc_div(q * 2, 3)
        elif level == 2:
            q = trunc_div(q * 3, 2)
    else:
        q = jnp.where(level == 1, trunc_div(q * 2, 3),
                      jnp.where(level == 2, trunc_div(q * 3, 2), q))
    return jnp.maximum(q, MINQUANT)


def _pad_even(r, ws: int, hs: int):
    """Edge-replicate to even dims (reproduces the C oddw/oddh branches)."""
    if ws & 1:
        r = jnp.concatenate([r, r[:, -1:]], axis=1)
    if hs & 1:
        r = jnp.concatenate([r, r[-1:, :]], axis=0)
    return r


def _haar_fwd_level(a, W: int, H: int, lvl: int, is_i):
    """C.3.1.2 Haar forward, one level (sbt.c:267-349). is_i may be traced."""
    ws = round_shift(W, lvl - 1)
    hs = round_shift(H, lvl - 1)
    r = _pad_even(a[:hs, :ws], ws, hs)
    x0 = r[0::2, 0::2]
    x1 = r[0::2, 1::2]
    x2 = r[1::2, 0::2]
    x3 = r[1::2, 1::2]
    LL = x0 + x1 + x2 + x3
    if lvl > 1:  # LVL_TEST (sbt.c:22)
        LL = trunc_div(LL * 4, 5)  # FWD_SCALE
    else:
        LL = jnp.where(is_i, trunc_div(LL * 4, 5), LL)
    LH = x0 - x1 + x2 - x3
    HL = x0 + x1 - x2 - x3
    HH = x0 - x1 - x2 + x3
    cw, ch = (ws + 1) // 2, (hs + 1) // 2
    fw, fh = ws // 2, hs // 2
    a = a.at[0:ch, 0:cw].set(LL)
    a = a.at[0:ch, cw:cw + fw].set(LH[:, :fw])
    a = a.at[ch:ch + fh, 0:cw].set(HL[:fh, :])
    a = a.at[ch:ch + fh, cw:cw + fw].set(HH[:fh, :fw])
    return a


def _haar_inv_level(a, W: int, H: int, lvl: int, is_i,
                    filtered: bool = False, hqp=None):
    """C.3.1.3/C.3.1.4 Haar inverse, one level (sbt.c:351-574).

    filtered=True applies the luma smoothing filter with bound ±hqp.
    is_i may be traced.
    """
    ws = round_shift(W, lvl - 1)
    hs = round_shift(H, lvl - 1)
    cw, ch = (ws + 1) // 2, (hs + 1) // 2
    fw, fh = ws // 2, hs // 2

    if lvl > 1:
        def inv_scale(v):
            return trunc_div(v * 5, 4)
    else:
        def inv_scale(v):
            return jnp.where(is_i, trunc_div(v * 5, 4), v)

    LL = inv_scale(a[0:ch, 0:cw])
    LH = jnp.pad(a[0:ch, cw:cw + fw], ((0, 0), (0, cw - fw)))
    HL = jnp.pad(a[ch:ch + fh, 0:cw], ((0, ch - fh), (0, 0)))
    HH = jnp.pad(a[ch:ch + fh, cw:cw + fw], ((0, ch - fh), (0, cw - fw)))

    if filtered:
        # C.3.1.4: nudge LH along x using LL left/right neighbours, HL along y.
        # Neighbour reads deliberately cross the quadrant boundary like the C.
        # The oddw/oddh tail row/column is emitted by the C's dedicated odd
        # branches (sbt.c:534-572) which never nudge — exclude both axes.
        rows = a[0:ch, :]
        lp = inv_scale(jnp.concatenate([rows[:, :1], rows[:, 0:cw - 1]], axis=1))
        ln = inv_scale(rows[:, 1:cw + 1])
        col = jnp.arange(cw)
        row = jnp.arange(ch)
        in_x = ((col >= 1) & (col <= fw - 1))[None, :] & (row <= fh - 1)[:, None]

        def nudge(LLv, lo, hi, band, mask):
            mx = LLv - hi
            mn = lo - LLv
            mn2 = jnp.minimum(mn, mx)
            mx2 = jnp.maximum(mn, mx)
            mx3 = jnp.minimum(mx2, 0)
            mn3 = jnp.maximum(mn2, 0)
            t = round4(lo - hi)
            nd = round2(jnp.clip(t, mx3, mn3) - (band * 2))
            nd = jnp.clip(nd, -hqp, hqp)
            return jnp.where(mask & (mx3 != mn3), band + nd, band)

        LH = nudge(LL, lp, ln, LH, in_x)

        cols = a[:, 0:cw]
        up = inv_scale(jnp.concatenate([cols[:1, :], cols[0:ch - 1, :]], axis=0))
        dn = inv_scale(cols[1:ch + 1, :])
        in_y = ((row >= 1) & (row <= fh - 1))[:, None] & (col <= fw - 1)[None, :]
        HL = nudge(LL, up, dn, HL, in_y)

    a00 = trunc_div(LL + LH + HL + HH, 4)
    a01 = trunc_div(LL - LH + HL - HH, 4)
    a10 = trunc_div(LL + LH - HL - HH, 4)
    a11 = trunc_div(LL - LH - HL + HH, 4)

    out = jnp.zeros((2 * ch, 2 * cw), a.dtype)
    out = out.at[0::2, 0::2].set(a00)
    out = out.at[0::2, 1::2].set(a01)
    out = out.at[1::2, 0::2].set(a10)
    out = out.at[1::2, 1::2].set(a11)
    return a.at[:hs, :ws].set(out[:hs, :ws])


def _b4t_fwd_axis(a, axis: int):
    """C.3.2.1 forward B4T along an axis (even length; sbt.c:90-126)."""
    if axis == 0:
        return _b4t_fwd_axis(a.T, 1).T
    n = a.shape[1]
    assert n % 2 == 0, "B4T requires even dimensions"
    even = a[:, 0::2]
    odd = a[:, 1::2]
    x0 = jnp.concatenate([odd[:, :1], odd[:, :-1]], axis=1)
    x1 = even
    x2 = odd
    x3 = jnp.concatenate([even[:, 1:], odd[:, -1:]], axis=1)
    L = round2(3 * (x1 + x2) - x0 - x3)
    H = round2(x0 - 3 * x1 + 3 * x2 - x3)
    return jnp.concatenate([L, H], axis=1)


def _b4t_inv_axis(a, axis: int):
    """C.3.2.2 inverse B4T along an axis (even length; sbt.c:128-163)."""
    if axis == 0:
        return _b4t_inv_axis(a.T, 1).T
    n = a.shape[1]
    assert n % 2 == 0, "B4T requires even dimensions"
    m = n // 2
    L = a[:, :m]
    H = a[:, m:]
    Lp = jnp.concatenate([L[:, :1], L[:, :-1]], axis=1)
    Hp = jnp.concatenate([H[:, :1], H[:, :-1]], axis=1)
    Ln = jnp.concatenate([L[:, 1:], L[:, -1:]], axis=1)
    Hn = jnp.concatenate([H[:, 1:], H[:, -1:]], axis=1)
    evens = round8(Lp + 3 * L + Hp - 3 * H)
    odds = round8(3 * L + Ln + 3 * H - Hn)
    out = jnp.zeros_like(a)
    out = out.at[:, 0::2].set(evens)
    out = out.at[:, 1::2].set(odds)
    return out


def _b4t_fwd_2d(a):
    """fwd_b4t_2d (sbt.c:240-251): rows then columns."""
    return _b4t_fwd_axis(_b4t_fwd_axis(a, 1), 0)


def _b4t_inv_2d(a):
    """inv_b4t_2d (sbt.c:253-265): columns then rows."""
    return _b4t_inv_axis(_b4t_inv_axis(a, 0), 1)


def fwd_sbt(coefs, is_p, constrain=None):
    """dsv_fwd_sbt (sbt.c:630-651) on centered int32 coefs of shape (H, W).

    is_p may be traced: level 1 then computes both B4T (intra) and Haar
    and selects — one extra level of work, which lets a whole GOP scan
    share a single compiled core for I and P frames (parallel/gop.py).

    constrain, if given, is `f(a, level) -> a` applied before and after
    each level — the tile-sharding hook (parallel/gop.py gop×tile mesh):
    it pins fine levels column-sharded and the coarse tail replicated,
    so XLA's SPMD partitioner inserts the B4T/Haar halo exchanges.
    """
    H, W = coefs.shape
    lvls = nlevels(W, H)
    a = jnp.asarray(coefs, jnp.int32)
    for i in range(1, lvls + 1):
        if constrain is not None:
            a = constrain(a, i)
        if i == 1:
            if isinstance(is_p, bool):
                a = _haar_fwd_level(a, W, H, i, not is_p) if is_p \
                    else _b4t_fwd_2d(a)
            else:
                a = jnp.where(is_p, _haar_fwd_level(a, W, H, i, ~is_p),
                              _b4t_fwd_2d(a))
        else:
            a = _haar_fwd_level(a, W, H, i, True)
        if constrain is not None:
            a = constrain(a, i)
    return a


def _hqp_for_level(q, is_p, i: int):
    """C.3.1.4 get_HQP (sbt.c:667-696). Returns traced int32."""
    llq = trunc_div(get_quant(q, is_p, 0), 2)
    if i > 3:
        return llq
    hqp = get_quant(q, is_p, MAXLVL - i)
    if i == 1:
        hqp = lb2(hqp)
        hqp = jnp.clip(hqp - jnp.where(is_p, QP_P, QP_I), 1, 24)
        hqp = jnp.left_shift(jnp.int32(1), hqp)
        hqp = hqp >> 1
    return trunc_div(hqp, 2)


def inv_sbt(coefs, q, is_p, is_luma: bool, constrain=None):
    """dsv_inv_sbt (sbt.c:653-714) on int32 coefs; q and is_p may be
    traced (level 1 computes both inverse transforms and selects when
    is_p is traced). constrain: per-level sharding hook (see fwd_sbt)."""
    H, W = coefs.shape
    lvls = nlevels(W, H)
    a = jnp.asarray(coefs, jnp.int32)
    for i in range(lvls, 0, -1):
        if constrain is not None:
            a = constrain(a, i)
        if i > 1:
            a = _haar_inv_level(a, W, H, i, True, filtered=is_luma,
                                hqp=_hqp_for_level(q, is_p, i)
                                if is_luma else None)
        else:
            if isinstance(is_p, bool):
                if is_p:
                    a = _haar_inv_level(a, W, H, 1, False,
                                        filtered=is_luma,
                                        hqp=_hqp_for_level(q, is_p, 1)
                                        if is_luma else None)
                else:
                    a = _b4t_inv_2d(a)
            else:
                ah = _haar_inv_level(a, W, H, 1, ~is_p, filtered=is_luma,
                                     hqp=_hqp_for_level(q, is_p, 1)
                                     if is_luma else None)
                a = jnp.where(is_p, ah, _b4t_inv_2d(a))
        if constrain is not None:
            a = constrain(a, i)
    return a


def plane_to_coefs(plane_u8):
    """p2sbc (sbt.c:576-592): center pixels around zero as int32."""
    return plane_u8.astype(jnp.int32) - 128


def coefs_to_plane(coefs):
    """sbc2int (C.3.3, sbt.c:594-614): +128 and clamp to u8."""
    return jnp.clip(coefs + 128, 0, 255).astype(jnp.uint8)
