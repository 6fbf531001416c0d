"""Finer 1080p stage attribution for the GOP chunk (VERDICT r5 item 1).

profile_1080p_true.py times prep/hme/core; the FULL chunk is ~2x their
sum. This emulates the remaining structure of parallel/gop.py run_batch
with the same public pieces and devtimes each: the vmapped P-frame scan
(stability + core + output staging), the post-scan compaction lax.maps,
and the blob concat — to locate the unaccounted milliseconds.

Usage: python tools/profile_scan_stages.py [w] [h]
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
    from dsv1_tpu.ops import frame as fr, hzcc
    from dsv1_tpu.ops.hme import hme_batch
    from dsv1_tpu.parallel.gop import (_stable_update, block_geometry,
                                       crf_quant, hzcc_cap_div)
    from dsv1_tpu.utils.yuv import frame_size

    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
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
    pk = jax.device_put(packed)

    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    levels = auto_pyramid_levels(w, h, nbh, nbv)
    layouts = list(_pyr_layouts(subsamp, w, h, levels))
    layout, coef_dims, tables = coef_geometry(subsamp, w, h, nbh, nbv)
    prep = make_prep(subsamp, w, h, levels)
    nblk = nbh * nbv
    split = fr.split_packed_planes
    core = make_encode_core_traced(subsamp, w, h, blk_w, blk_h, nbh, nbv)
    ll_sizes = [int(t.seg_bounds[1]) for t in tables]
    cap_div = hzcc_cap_div(quant)
    sr = G - 1

    def row(label, ms):
        print(f"{label:40s} {ms:9.3f} ms", flush=True)

    def run_prep(pk):
        y, u, v = split(pk, subsamp, w, h)
        return jax.vmap(lambda a, b, c: prep((a, b, c)))(y, u, v)

    imgs_all, al = jax.jit(run_prep)(pk)
    srcs = [a[1:].reshape(G - 1, -1) for a in imgs_all]
    refs = [a[:-1].reshape(G - 1, -1) for a in imgs_all]
    npl = len(srcs)

    def run_hme(*sr_):
        return hme_batch(list(sr_[:npl]), list(sr_[npl:]), layouts,
                         blk_w, blk_h, nbh, nbv, subsamp, levels)

    mv_all = jax.jit(run_hme)(*srcs, *refs)

    # --- the P-frame scan exactly as run_batch builds it (C=1 vmap)
    imgs0 = imgs_all[0].reshape(1, G, -1)
    mvkeys = ("mode", "mvx", "mvy", "submask", "lo_tex", "lo_var",
              "high_detail")
    mv_b = {k: mv_all[k][None] for k in mvkeys}

    def mk_scan(emit_qvals: bool):
        def step(carry, x):
            ref_recon, stability, refresh_ctr = carry

            def frame_p(rr, st, rc, im, mv1):
                st, rc, stable_blocks = _stable_update(
                    st, rc, jnp.bool_(True), mv1, sr)
                margs = tuple(mv1[k].reshape(-1)
                              for k in ("mode", "mvx", "mvy", "submask"))
                qvals, dcs, recon = core(im, rr, jnp.bool_(True),
                                         jnp.int32(quant), stable_blocks,
                                         *margs)
                rc = rc + 1
                out = {"dc": jnp.stack([jnp.asarray(d, jnp.int32)
                                        for d in dcs]),
                       "stable": stable_blocks}
                if emit_qvals:
                    out["qvals"] = tuple(qvals)
                return recon, st, rc, out

            recon, stability, refresh_ctr, out = jax.vmap(frame_p)(
                ref_recon, stability, refresh_ctr, *x)
            return (recon, stability, refresh_ctr), out

        def scan_all(imgs0, mvd):
            ref0 = jnp.zeros((1, imgs0.shape[-1]), jnp.uint8)
            stab0 = jnp.zeros((1, nblk, 2), jnp.int32)
            rc0 = jnp.zeros(1, jnp.int32)
            xs = (jnp.moveaxis(imgs0[:, 1:], 0, 1),
                  {k: jnp.moveaxis(v, 0, 1) for k, v in mvd.items()})
            carry, outs = lax.scan(step, (ref0, stab0, rc0), xs)
            return outs

        return scan_all

    args = (imgs0, mv_b)
    t = devtime(mk_scan(False), args)
    row("P-scan 11f (stab+core, no qvals out)", t * 1e3)
    t = devtime(mk_scan(True), args)
    row("P-scan 11f (+dense qvals staging)", t * 1e3)
    outs = jax.jit(mk_scan(True))(*args)

    # --- post-scan compaction exactly as compact_hoisted
    qv_p = outs["qvals"]  # tuple of (11, 1, n_c) (frame-major from scan)

    def compact_all(*qvs):
        comp = []
        for qv in qvs:
            Cb = qv.shape[0] * qv.shape[1]
            res = lax.map(lambda q: hzcc.compact_sparse_p(q, cap_div),
                          qv.reshape(Cb, -1))
            comp.append(res)
        return comp

    t = devtime(compact_all, tuple(qv_p))
    row("compact_sparse_p lax.map (3pl x 11f)", t * 1e3)

    # --- I-frame compaction
    qv_i = [q[0, :1] for q in qv_p]

    def compact_i(*qvs):
        return [lax.map(lambda q, ll=ll_n: hzcc.compact_dense_i(q, ll), qv)
                for qv, ll_n in zip(qvs, ll_sizes)]

    t = devtime(compact_i, tuple(qv_i))
    row("compact_dense_i lax.map (3pl x 1f)", t * 1e3)


if __name__ == "__main__":
    main()
