"""Per-op xprof of the full GOP-chunk executable (1080p by default).

Prints the top device fusions of one chunk dispatch — the honest
breakdown of where the chunk's device milliseconds go (VERDICT r4 item
1: RESULTS' stage log stopped at the whole-chunk number).

Usage: python tools/profile_chunk_ops.py [w] [h] [top]
"""
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from xprof import xprof  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / "build"
                          / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from tests import corpus
    from dsv1_tpu.constants import SUBSAMP_420, quality_percent
    from dsv1_tpu.ops import frame as fr
    from dsv1_tpu.parallel.gop import (_jit_batched, block_geometry,
                                       crf_quant)
    from dsv1_tpu.utils.yuv import frame_size

    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    G = 12
    subsamp = SUBSAMP_420
    quality = quality_percent(85)
    quant = crf_quant(quality)
    yuv = corpus.make_clip(w, h, subsamp, G, seed=11)
    fsz = frame_size(w, h, subsamp)
    frames = [fr.np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                            np.uint8), subsamp, w, h)
              for i in range(G)]
    packed = np.stack([fr.np_pack_planes(f) for f in frames])
    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    nblk = nbh * nbv
    fn, _ = _jit_batched(subsamp, w, h, G, quality, True, 4, 50, 0, 0,
                         None, effort=0)
    args = (packed[None], np.zeros(1, np.int32),
            np.zeros((1, nblk, 2), np.int32), np.zeros(1, np.int32),
            np.full((1, 2), quant, np.int32))
    args = tuple(jax.device_put(a) for a in args)
    xprof(lambda: jax.block_until_ready(fn(*args)), top=top)


if __name__ == "__main__":
    main()
