"""ops/piclen.py property tests: the device-side picture-length mirror
must match the real native packer byte for byte, over random stability
patterns, motion fields, and coefficient sparsity — this is what makes
the in-scan ABR law exact (parallel/gop.py)."""

import numpy as np
import pytest

from dsv1_tpu import bits
from dsv1_tpu.constants import FOURCC, MAX_QP_BITS, VERSION_MINOR, make_pt
from dsv1_tpu.ops import piclen
from dsv1_tpu.ops.hzcc import runs_from_qvals

pytestmark = pytest.mark.smoke


def _rand_case(rng, nbh, nbv, sizes, has_ref, density):
    nblk = nbh * nbv
    stable = (rng.random(nblk) < 0.5).astype(np.uint8)
    stable |= (rng.random(nblk) < 0.2).astype(np.uint8) << 1
    mode = (rng.random(nblk) < 0.3).astype(np.uint8)  # 1 = intra
    mvx = np.where(mode == 0, rng.integers(-600, 600, nblk), 0).astype(np.int16)
    mvy = np.where(mode == 0, rng.integers(-600, 600, nblk), 0).astype(np.int16)
    submask = np.where(
        rng.random(nblk) < 0.5, 0xF, rng.integers(0, 15, nblk)
    ).astype(np.uint8)
    submask = np.where(mode == 1, submask, 0).astype(np.uint8)
    qvals, dcs = [], []
    for n in sizes:
        qv = np.where(rng.random(n) < density,
                      rng.integers(-3000, 3000, n), 0).astype(np.int32)
        qvals.append(qv)
        dcs.append(int(rng.integers(-512, 512)))
    return stable, mode, mvx, mvy, submask, qvals, dcs


@pytest.mark.parametrize("has_ref", [False, True])
@pytest.mark.parametrize("density", [0.0, 0.02, 0.4, 1.0])
def test_picture_len_matches_packer(has_ref, density):
    rng = np.random.default_rng(hash((has_ref, density)) & 0xFFFF)
    nbh, nbv = 7, 5
    sizes = (1200, 311, 320)
    for trial in range(4):
        stable, mode, mvx, mvy, submask, qvals, dcs = _rand_case(
            rng, nbh, nbv, sizes, has_ref, density)
        quant = int(rng.integers(5, 2047))
        planes = []
        for qv, dc in zip(qvals, dcs):
            runs, vals = runs_from_qvals(qv)
            planes.append((runs, vals, dc))
        pkt = bits.pack_picture(
            FOURCC, VERSION_MINOR, make_pt(True, has_ref), 42, 32, 16,
            nbh, nbv, stable, has_ref,
            mode if has_ref else None, mvx if has_ref else None,
            mvy if has_ref else None, submask if has_ref else None,
            quant, MAX_QP_BITS, planes)
        got = int(piclen.picture_len(
            32, 16, nbh, nbv, MAX_QP_BITS, stable, has_ref,
            mode, mvx, mvy, submask, qvals, dcs, maybe_p=True))
        assert got == len(pkt), (trial, got, len(pkt))


def test_picture_len_intra_slot():
    """maybe_p=False folds the motion section away entirely."""
    rng = np.random.default_rng(7)
    nbh, nbv = 4, 3
    sizes = (500, 120, 130)
    stable, mode, mvx, mvy, submask, qvals, dcs = _rand_case(
        rng, nbh, nbv, sizes, False, 0.1)
    planes = [(*runs_from_qvals(qv), dc) for qv, dc in zip(qvals, dcs)]
    planes = [(r, v, d) for (r, v, d) in planes]
    pkt = bits.pack_picture(
        FOURCC, VERSION_MINOR, make_pt(True, False), 0, 16, 16,
        nbh, nbv, stable, False, None, None, None, None,
        977, MAX_QP_BITS, planes)
    got = int(piclen.picture_len(
        16, 16, nbh, nbv, MAX_QP_BITS, stable, False,
        None, None, None, None, qvals, dcs, maybe_p=False))
    assert got == len(pkt)


def test_zbrle_edges():
    """All-zero / all-one / single flags vs the packer's ZBRLE."""
    for flags in (np.zeros(37, np.uint8), np.ones(37, np.uint8),
                  np.eye(1, 37, 36, dtype=np.uint8)[0],
                  np.eye(1, 37, 0, dtype=np.uint8)[0]):
        qv = [np.zeros(64, np.int32)] * 3
        pkt = bits.pack_picture(
            FOURCC, VERSION_MINOR, make_pt(True, False), 0, 16, 16,
            37, 1, flags, False, None, None, None, None, 100,
            MAX_QP_BITS, [(np.zeros(0, np.uint32), np.zeros(0, np.int32), 0)] * 3)
        got = int(piclen.picture_len(
            16, 16, 37, 1, MAX_QP_BITS, flags, False,
            None, None, None, None, qv, [0, 0, 0], maybe_p=False))
        assert got == len(pkt)
