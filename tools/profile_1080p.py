"""Stage-level device timing for the 1080p GOP encode: prep/pyramids,
HME, encode-core scan, compaction — each as its own jit, timed on the
real chip. Drives the VERDICT r2 item 2 optimization loop."""
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / "build"
                      / "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    from tests import corpus
    from dsv1_tpu.constants import SUBSAMP_420, quality_percent
    from dsv1_tpu.models.encoder import (EncoderConfig, _pyr_layouts,
                                         auto_pyramid_levels, coef_geometry,
                                         make_encode_core_traced, make_prep)
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.ops import frame as fr
    from dsv1_tpu.ops.frame import np_pack_planes, np_yuv_split
    from dsv1_tpu.ops.hme import hme_batch
    from dsv1_tpu.ops.hzcc import compact_dense_i, compact_sparse_p
    from dsv1_tpu.ops.pallas_hme import use_pallas
    from dsv1_tpu.parallel.gop import block_geometry, crf_quant
    from dsv1_tpu.utils.yuv import frame_size

    w, h, G = 1920, 1080, 12
    subsamp = SUBSAMP_420
    quality = quality_percent(85)
    print(f"{w}x{h} gop{G} use_pallas={use_pallas()} dev={jax.devices()[0]}")

    yuv = corpus.make_clip(w, h, subsamp, G, seed=11)
    fsz = frame_size(w, h, subsamp)
    frames = [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                         np.uint8), subsamp, w, h)
              for i in range(G)]
    packed = np.stack([np_pack_planes(f) for f in frames])
    pk = jax.device_put(packed)

    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    levels = auto_pyramid_levels(w, h, nbh, nbv)
    print(f"blk {blk_w}x{blk_h} grid {nbh}x{nbv} levels {levels}")
    layouts = list(_pyr_layouts(subsamp, w, h, levels))
    prep = make_prep(subsamp, w, h, levels)

    split = fr.split_packed_planes

    @jax.jit
    def run_prep(pk):
        y, u, v = split(pk, subsamp, w, h)
        return jax.vmap(lambda a, b, c: prep((a, b, c)))(y, u, v)

    (imgs_all, al), t_prep = timeit("prep+pyramids (12f)", run_prep, pk)

    srcs = [a[1:] for a in imgs_all]
    refs = [a[:-1] for a in imgs_all]

    @jax.jit
    def run_hme(srcs, refs):
        return hme_batch([s.reshape(G - 1, -1) for s in srcs],
                         [r.reshape(G - 1, -1) for r in refs],
                         layouts, blk_w, blk_h, nbh, nbv, subsamp, levels)

    mv_all, t_hme = timeit("hme_batch (11 pairs)", run_hme, srcs, refs)

    core = make_encode_core_traced(subsamp, w, h, blk_w, blk_h, nbh, nbv)
    quant = crf_quant(quality)
    nblk = nbh * nbv
    ll_sizes = [int(t.seg_bounds[1])
                for t in coef_geometry(subsamp, w, h, nbh, nbv)[2]]

    margs0 = tuple(jnp.zeros(nblk, jnp.int32) for _ in range(4))
    stable = jnp.ones(nblk, jnp.uint8)

    @jax.jit
    def run_core_i(img0):
        return core(img0, fr.alloc_image(layouts[0]), jnp.bool_(False),
                    jnp.int32(quant), stable, *margs0)

    (qv_i, dcs_i, recon_i), t_ci = timeit("core I (1 frame)", run_core_i,
                                          imgs_all[0][0])

    mv1 = {k: mv_all[k][0] for k in ("mode", "mvx", "mvy", "submask")}

    @jax.jit
    def run_core_p(img0, ref, mv1):
        m = tuple(mv1[k].reshape(-1) for k in
                  ("mode", "mvx", "mvy", "submask"))
        return core(img0, ref, jnp.bool_(True), jnp.int32(quant), stable, *m)

    (qv_p, _, _), t_cp = timeit("core P (1 frame)", run_core_p,
                                imgs_all[0][1], recon_i, mv1)

    @jax.jit
    def run_compact_i(qv):
        return tuple(compact_dense_i(q, n) for q, n in zip(qv, ll_sizes))

    _, t_compi = timeit("compact I (1 frame)", run_compact_i, qv_i)

    @jax.jit
    def run_compact_p(qv):
        return tuple(compact_sparse_p(q) for q in qv)

    _, t_compp = timeit("compact P (1 frame)", run_compact_p, qv_p)

    per_gop = (t_prep + t_hme + t_ci + t_compi
               + (G - 1) * (t_cp + t_compp))
    print(f"\nsum-of-stages per GOP  {per_gop * 1e3:9.2f} ms "
          f"-> {G / per_gop:6.2f} fps")
    print(f"  breakdown: prep {t_prep*1e3:.1f} hme {t_hme*1e3:.1f} "
          f"coreI {t_ci*1e3:.1f}+cmp {t_compi*1e3:.1f} "
          f"coreP {(G-1)*t_cp*1e3:.1f}+cmp {(G-1)*t_compp*1e3:.1f}")


if __name__ == "__main__":
    main()
