"""Bisect the 1080p GOP chunk's device time (tools/devtime methodology):
motion-only vs scan-without-compaction vs full — locates the gap between
the ~165 ms sum-of-stages and the measured 540 ms chunk."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from devtime import devtime  # noqa: E402


def main():
    from tests import corpus
    from dsv1_tpu.constants import SUBSAMP_420, quality_percent
    from dsv1_tpu.ops import frame as fr
    from dsv1_tpu.parallel import gop as G_
    from dsv1_tpu.utils.yuv import frame_size

    w, h, G = 1920, 1080, 12
    subsamp = SUBSAMP_420
    quality = quality_percent(85)
    quant = G_.crf_quant(quality)
    blk_w, blk_h, nbh, nbv = G_.block_geometry(w, h)
    nblk = nbh * nbv

    yuv = corpus.make_clip(w, h, subsamp, G, seed=11)
    fsz = frame_size(w, h, subsamp)
    frames = [fr.np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                            np.uint8), subsamp, w, h)
              for i in range(G)]
    packed = jax.device_put(
        np.stack([fr.np_pack_planes(f) for f in frames])[None])

    stab0 = jax.device_put(np.zeros((1, nblk, 2), np.int32))
    ref0 = jax.device_put(np.zeros(1, np.int32))
    al0 = jax.device_put(np.zeros(1, np.int32))
    quants = jax.device_put(np.full((1, 2), quant, np.int32))

    def row(label, ms):
        print(f"{label:40s} {ms:9.3f} ms", flush=True)

    import dsv1_tpu.models.encoder as ME

    for compact in (1024, 0):
        enc = G_.build_gop_encoder.__wrapped__(
            subsamp, w, h, G, quality, True, 4, 50, 0, 0, compact) \
            if hasattr(G_.build_gop_encoder, "__wrapped__") \
            else G_.build_gop_encoder(subsamp, w, h, G, quality,
                                      compact=compact)
        # grab the internal run_batch via the blob runner's closure
        t = devtime(lambda *a: enc.batch(*a),
                    (packed, al0, stab0, ref0, quants), r1=1, r2=4)
        row(f"full chunk (compact={compact})", t * 1e3)

    # motion-only: prep+pyramids+hme+scd verdicts
    enc = G_.build_gop_encoder(subsamp, w, h, G, quality)
    import inspect
    # rebuild the motion path the same way build_gop_encoder does
    from dsv1_tpu.models.encoder import (_pyr_layouts, auto_pyramid_levels,
                                         make_prep)
    from dsv1_tpu.ops.hme import hme_batch
    levels = auto_pyramid_levels(w, h, nbh, nbv)
    layouts = list(_pyr_layouts(subsamp, w, h, levels))
    prep = make_prep(subsamp, w, h, levels)

    def motion_only(packed):
        C = packed.shape[0]
        B = C * G
        y, u, v = fr.split_packed_planes(packed.reshape(B, -1), subsamp,
                                         w, h)
        imgs_all, al_all = jax.vmap(lambda a, b, c: prep((a, b, c)))(y, u, v)
        pairs_s = [a.reshape(C, G, -1)[:, 1:].reshape(C * (G - 1), -1)
                   for a in imgs_all]
        pairs_r = [a.reshape(C, G, -1)[:, :-1].reshape(C * (G - 1), -1)
                   for a in imgs_all]
        mv = hme_batch(pairs_s, pairs_r, layouts, blk_w, blk_h, nbh, nbv,
                       subsamp, levels)
        return mv["mvx"], mv["intra_pct"], al_all

    t = devtime(motion_only, (packed,), r1=1, r2=4)
    row("motion only (prep+hme+verdicts)", t * 1e3)


if __name__ == "__main__":
    main()
