"""Drill-down device timing of the encode core's internal stages at
1080p: compensate/residual, forward SBT, HZCC quant+traversal, inverse
SBT, recon add. The core is the 1080p bottleneck (28 ms/frame vs 1.2 ms
for a whole GOP's HME — tools/profile_1080p.py); this locates the ms."""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / "build"
                      / "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:36s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    from dsv1_tpu.constants import SUBSAMP_420, quality_percent
    from dsv1_tpu.models.encoder import (_pyr_layouts, coef_geometry,
                                         make_prep)
    from dsv1_tpu.ops import bmc, frame as fr, hzcc, sbt
    from dsv1_tpu.parallel.gop import block_geometry, crf_quant

    w, h = 1920, 1080
    subsamp = SUBSAMP_420
    quant = crf_quant(quality_percent(85))
    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    layout, coef_dims, tables = coef_geometry(subsamp, w, h, nbh, nbv)
    layouts = list(_pyr_layouts(subsamp, w, h, 0))
    prep = make_prep(subsamp, w, h, 0)
    nblk = nbh * nbv

    rng = np.random.default_rng(3)
    fsz = w * h * 3 // 2
    packed = rng.integers(0, 256, fsz, dtype=np.uint8)
    img, _ = jax.jit(lambda p: prep(fr.split_packed_planes(p, subsamp,
                                                           w, h)))(packed)
    img0 = jax.device_put(img[0])
    ref = jax.device_put(img[0])
    stable = jnp.ones(nblk, jnp.uint8)
    modes = jnp.ones(nblk, jnp.int32)
    mvx = jnp.asarray(rng.integers(-8, 8, nblk), jnp.int32)
    mvy = jnp.asarray(rng.integers(-8, 8, nblk), jnp.int32)
    sub = jnp.zeros(nblk, jnp.int32)

    # luma plane only (c=0): dominates at 4:2:0
    c = 0
    p = layout.planes[c]
    cw, ch = coef_dims[c]

    @jax.jit
    def stage_pred(img0, ref):
        ref_plane = fr.plane_view(ref, layout, c)
        pred = bmc.compensate_plane(ref, ref_plane, layout, c, blk_w,
                                    blk_h, nbh, nbv, modes, mvx, mvy, sub)
        src = fr.plane_view_ext(img0, layout, c, cw - p.w)[:p.h, :p.w]
        return bmc.sub_residual(src, pred), pred

    (core_res, pred), t_pred = timeit("compensate+residual (luma)",
                                      stage_pred, img0, ref)

    coefs0 = jnp.asarray(np.asarray(core_res, np.int32) - 128)
    cf = jnp.zeros((ch, cw), jnp.int32).at[:p.h, :p.w].set(coefs0)

    for is_p in (False, True):
        tag = "P" if is_p else "I"

        @jax.jit
        def stage_fwd(cf):
            return sbt.fwd_sbt(cf, jnp.bool_(is_p))

        coefs, t_fwd = timeit(f"fwd_sbt {tag} (luma)", stage_fwd, cf)

        @jax.jit
        def stage_hzcc(coefs):
            return hzcc.encode_plane_core(coefs, jnp.int32(quant),
                                          jnp.bool_(is_p), c, stable,
                                          tables[c])

        (qv, wb), t_q = timeit(f"hzcc quant+traverse {tag} (luma)",
                               stage_hzcc, coefs)

        @jax.jit
        def stage_inv(wb):
            return sbt.inv_sbt(wb, jnp.int32(quant), jnp.bool_(is_p),
                               is_luma=True)

        _, t_inv = timeit(f"inv_sbt filtered {tag} (luma)", stage_inv, wb)

    @jax.jit
    def stage_compact(qv):
        return hzcc.compact_sparse_p(qv)

    timeit("compact_sparse_p (luma)", stage_compact, qv)

    # is_p traced (the GOP-scan configuration: both level-1 transforms)
    @jax.jit
    def stage_fwd_tr(cf, is_p):
        return sbt.fwd_sbt(cf, is_p)

    timeit("fwd_sbt traced-is_p (luma)", stage_fwd_tr, cf, jnp.bool_(True))

    @jax.jit
    def stage_inv_tr(wb, is_p):
        return sbt.inv_sbt(wb, jnp.int32(quant), is_p, is_luma=True)

    timeit("inv_sbt traced-is_p (luma)", stage_inv_tr, wb, jnp.bool_(True))


if __name__ == "__main__":
    main()
