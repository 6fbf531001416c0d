"""Honest stage-level device timing at 1080p via tools/devtime.py
(in-jit repetition + differencing — single-dispatch timings through the
axon tunnel are unreliable; see devtime docstring).

Stages mirror the GOP encode path (parallel/gop.py run_batch):
prep/pyramids, batched HME, encode core I/P (traced is_p), compaction,
piclen, and the full single-GOP batch step.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from devtime import devtime  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / "build"
                          / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from tests import corpus
    from dsv1_tpu.constants import SUBSAMP_420, quality_percent
    from dsv1_tpu.models.encoder import (_pyr_layouts, auto_pyramid_levels,
                                         coef_geometry,
                                         make_encode_core_traced, make_prep)
    from dsv1_tpu.ops import bmc, frame as fr, hzcc, sbt
    from dsv1_tpu.ops.hme import hme_batch
    from dsv1_tpu.ops.pallas_hme import use_pallas
    from dsv1_tpu.parallel.gop import (_jit_batched, block_geometry,
                                       crf_quant)
    from dsv1_tpu.utils.yuv import frame_size

    w, h, G = 1920, 1080, 12
    subsamp = SUBSAMP_420
    quality = quality_percent(85)
    quant = crf_quant(quality)
    print(f"{w}x{h} gop{G} use_pallas={use_pallas()} "
          f"dev={jax.devices()[0]}", flush=True)

    yuv = corpus.make_clip(w, h, subsamp, G, seed=11)
    fsz = frame_size(w, h, subsamp)
    frames = [fr.np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                            np.uint8), subsamp, w, h)
              for i in range(G)]
    packed = np.stack([fr.np_pack_planes(f) for f in frames])
    pk = jax.device_put(packed)

    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    levels = auto_pyramid_levels(w, h, nbh, nbv)
    layout, coef_dims, tables = coef_geometry(subsamp, w, h, nbh, nbv)
    layouts = list(_pyr_layouts(subsamp, w, h, levels))
    prep = make_prep(subsamp, w, h, levels)
    nblk = nbh * nbv
    split = fr.split_packed_planes

    def row(label, ms):
        print(f"{label:36s} {ms:9.3f} ms", flush=True)

    # --- prep + pyramids, whole GOP
    def run_prep(pk):
        y, u, v = split(pk, subsamp, w, h)
        return jax.vmap(lambda a, b, c: prep((a, b, c)))(y, u, v)

    t = devtime(run_prep, (pk,))
    row("prep+pyramids (12f)", t * 1e3)
    imgs_all, al = jax.jit(run_prep)(pk)

    # --- HME batched over the GOP's 11 P pairs
    srcs = [a[1:].reshape(G - 1, -1) for a in imgs_all]
    refs = [a[:-1].reshape(G - 1, -1) for a in imgs_all]
    npl = len(srcs)

    def run_hme(*sr):
        return hme_batch(list(sr[:npl]), list(sr[npl:]), layouts,
                         blk_w, blk_h, nbh, nbv, subsamp, levels)

    t = devtime(run_hme, (*srcs, *refs))
    row("hme_batch (11 pairs)", t * 1e3)
    mv_all = jax.jit(run_hme)(*srcs, *refs)

    # --- encode core (traced is_p), single frame
    core = make_encode_core_traced(subsamp, w, h, blk_w, blk_h, nbh, nbv)
    stable = jnp.ones(nblk, jnp.uint8)
    mv1 = tuple(mv_all[k][0].reshape(-1)
                for k in ("mode", "mvx", "mvy", "submask"))
    img_i = imgs_all[0][0]
    img_p = imgs_all[0][1]

    def run_core(img, ref, isp):
        return core(img, ref, isp, jnp.int32(quant), stable, *mv1)

    (qv_i, dcs, recon) = jax.jit(run_core)(
        img_i, fr.alloc_image(layouts[0]), jnp.bool_(False))
    t = devtime(run_core, (img_p, recon, jnp.bool_(True)))
    row("core traced (1 frame, P)", t * 1e3)
    qv_p = jax.jit(run_core)(img_p, recon, jnp.bool_(True))[0]

    # --- core sub-stages, luma only
    c = 0
    p = layout.planes[c]
    cw, ch = coef_dims[c]
    modes = jnp.ones(nblk, jnp.int32)
    sub = jnp.zeros(nblk, jnp.int32)

    def stage_pred(img0, ref):
        ref_plane = fr.plane_view(ref, layout, c)
        pred = bmc.compensate_plane(ref, ref_plane, layout, c, blk_w,
                                    blk_h, nbh, nbv, modes, mv1[1],
                                    mv1[2], sub)
        src = fr.plane_view_ext(img0, layout, c, cw - p.w)[:p.h, :p.w]
        return bmc.sub_residual(src, pred)

    t = devtime(stage_pred, (img_p, recon))
    row("compensate+residual (luma)", t * 1e3)
    res = jax.jit(stage_pred)(img_p, recon)

    cf = jnp.zeros((ch, cw), jnp.int32).at[:p.h, :p.w].set(
        res.astype(jnp.int32) - 128)

    t = devtime(lambda x: sbt.fwd_sbt(x, jnp.bool_(True)), (cf,))
    row("fwd_sbt traced (luma)", t * 1e3)
    coefs = jax.jit(lambda x: sbt.fwd_sbt(x, True))(cf)

    def run_hzcc(coefs):
        return hzcc.encode_plane_core(coefs, jnp.int32(quant),
                                      jnp.bool_(True), c, stable,
                                      tables[c])

    t = devtime(run_hzcc, (coefs,))
    row("hzcc quant+traverse (luma)", t * 1e3)
    qv, wb = jax.jit(run_hzcc)(coefs)

    t = devtime(lambda x: sbt.inv_sbt(x, jnp.int32(quant), jnp.bool_(True),
                                      True), (wb,))
    row("inv_sbt traced (luma)", t * 1e3)

    t = devtime(lambda x: hzcc.compact_sparse_p(x), (qv,))
    row("compact_sparse_p (luma)", t * 1e3)

    ll_sizes = [int(t2.seg_bounds[1]) for t2 in tables]
    t = devtime(lambda x: hzcc.compact_dense_i(x, ll_sizes[0]), (qv_i[0],))
    row("compact_dense_i (luma)", t * 1e3)

    # --- full single-GOP batched chunk (the shipped executable)
    fn, _unpack = _jit_batched(subsamp, w, h, G, quality, True, 4, 50,
                               0, 0, None, effort=0)
    args = (pk[None], np.zeros(1, np.int32),
            np.zeros((1, nblk, 2), np.int32), np.zeros(1, np.int32),
            np.full((1, 2), quant, np.int32))
    args = tuple(jax.device_put(a) for a in args)
    t = devtime(lambda *a: fn(*a), args, r1=1, r2=4)
    row("FULL GOP chunk (12 frames)", t * 1e3)
    print(f"  -> device encode fps {G / t:8.1f}", flush=True)


if __name__ == "__main__":
    main()
