"""Sub-stage device timing of the encode core at a given size (default
1080p): MC, forward SBT, HZCC quant core, inverse SBT — per plane."""
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
    print(f"{label:40s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    from dsv1_tpu.constants import SUBSAMP_420, quality_percent
    from dsv1_tpu.models.encoder import coef_geometry
    from dsv1_tpu.ops import bmc, hzcc, sbt
    from dsv1_tpu.ops import frame as fr
    from dsv1_tpu.parallel.gop import block_geometry, crf_quant

    subsamp = SUBSAMP_420
    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    layout, coef_dims, tables = coef_geometry(subsamp, w, h, nbh, nbv)
    quant = crf_quant(quality_percent(85))
    nblk = nbh * nbv
    rng = np.random.default_rng(0)

    img = jax.device_put(rng.integers(0, 255, layout.total,
                                      dtype=np.uint8).view(np.uint8))
    ref = jax.device_put(rng.integers(0, 255, layout.total,
                                      dtype=np.uint8).view(np.uint8))
    modes = jax.device_put((rng.random(nblk) < 0.2).astype(np.int32))
    mvx = jax.device_put(rng.integers(-32, 32, nblk).astype(np.int32))
    mvy = jax.device_put(rng.integers(-32, 32, nblk).astype(np.int32))
    subm = jax.device_put(rng.integers(0, 16, nblk).astype(np.int32))
    stable = jax.device_put(rng.integers(0, 4, nblk).astype(np.uint8))

    for c in (0, 1):
        p = layout.planes[c]
        cw, ch = coef_dims[c]
        print(f"--- plane {c}: {p.w}x{p.h} coefs {cw}x{ch}")

        @jax.jit
        def mc(img, ref):
            ref_plane = fr.plane_view(ref, layout, c)
            pred = bmc.compensate_plane(ref, ref_plane, layout, c,
                                        blk_w, blk_h, nbh, nbv,
                                        modes, mvx, mvy, subm)
            src = fr.plane_view_ext(img, layout, c, cw - p.w)[:p.h, :p.w]
            return bmc.sub_residual(src, pred)

        core, _ = timeit("MC compensate+sub", mc, img, ref)

        coefs = jax.device_put(
            rng.integers(-128, 128, (ch, cw)).astype(np.int32))

        for is_p in (True, False):
            f = jax.jit(lambda a, ip=is_p: sbt.fwd_sbt(a, ip))
            timeit(f"fwd_sbt static is_p={is_p}", f, coefs)
        f = jax.jit(lambda a, ip: sbt.fwd_sbt(a, ip))
        fc, _ = timeit("fwd_sbt traced is_p", f, coefs, jnp.bool_(True))

        @jax.jit
        def enc(a, ip):
            return hzcc.encode_plane_core(a, jnp.int32(quant), ip, c,
                                          stable, tables[c])

        (qv, wb), _ = timeit("hzcc encode_plane_core", enc, fc,
                             jnp.bool_(True))

        for is_p in (True, False):
            f = jax.jit(lambda a, ip=is_p: sbt.inv_sbt(
                a, jnp.int32(quant), ip, c == 0))
            timeit(f"inv_sbt static is_p={is_p}", f, wb)
        f = jax.jit(lambda a, ip: sbt.inv_sbt(a, jnp.int32(quant), ip,
                                              c == 0))
        timeit("inv_sbt traced is_p", f, wb, jnp.bool_(True))


if __name__ == "__main__":
    main()
