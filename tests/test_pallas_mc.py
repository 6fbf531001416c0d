"""Golden test: the pallas MC kernel (ops/pallas_mc.py) vs the XLA
compensate_plane, interpret mode (CPU CI). The XLA form is itself
golden-tested against the reference C compensate through the e2e
encoder/decoder byte-identity suites, so kernel == XLA => kernel ==
reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from dsv1_tpu.constants import SUBSAMP_420
from dsv1_tpu.ops import bmc, frame as fr, pallas_mc

from . import corpus


@pytest.mark.parametrize("w,h,seed", [(96, 80, 0), (100, 84, 1),
                                      (96, 88, 2)])
@pytest.mark.parametrize("c", [0, 1])
def test_mc_kernel_matches_xla(w, h, seed, c, monkeypatch):
    monkeypatch.setattr(pallas_mc, "INTERPRET", True)
    blk = 16
    nbh, nbv = -(-w // blk), -(-h // blk)
    nblk = nbh * nbv
    rng = np.random.default_rng(seed)
    yuv = corpus.make_clip(w, h, SUBSAMP_420, 1, seed=seed)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    planes = fr.np_yuv_split(np.frombuffer(yuv[:fsz], np.uint8),
                             SUBSAMP_420, w, h)
    layout = fr.make_layout(SUBSAMP_420, w, h, True)
    img = fr.image_from_planes(layout, [jnp.asarray(p) for p in planes])
    # random MV field incl. intra blocks, extreme clamped MVs, submasks
    modes = rng.integers(0, 2, nblk).astype(np.int32)
    mvx = (rng.integers(-2 * w, 2 * w, nblk)).astype(np.int32)
    mvy = (rng.integers(-2 * h, 2 * h, nblk)).astype(np.int32)
    sub = rng.integers(0, 16, nblk).astype(np.int32)
    ref_plane = fr.plane_view(img, layout, c)
    args = (img, ref_plane, layout, c, blk, blk, nbh, nbv,
            jnp.asarray(modes), jnp.asarray(mvx), jnp.asarray(mvy),
            jnp.asarray(sub))
    ref = np.asarray(bmc.compensate_plane(*args, pallas_ok=False))
    got = np.asarray(bmc.compensate_plane(*args, pallas_ok=True))
    np.testing.assert_array_equal(got, ref)
