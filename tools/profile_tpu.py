"""TPU-side profile: link bandwidths + encode_stream_gops phase breakdown.

Run on the real chip (no env overrides). Prints a compact report used to
decide where the next encode-throughput win is.
"""
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


def bw_probe():
    dev = jax.devices()[0]
    print("device:", dev)
    k = jax.jit(lambda x: x + 1)
    for sz in (1 << 20, 8 << 20, 32 << 20):
        a = np.zeros(sz, np.uint8)
        # H2D single
        t0 = time.perf_counter()
        xs = jax.device_put(a)
        xs.block_until_ready()
        h2d = time.perf_counter() - t0
        # H2D 4 parallel streams
        parts = [np.zeros(sz // 4, np.uint8) for _ in range(4)]
        t0 = time.perf_counter()
        ys = [jax.device_put(p) for p in parts]
        jax.block_until_ready(ys)
        h2d4 = time.perf_counter() - t0
        # D2H
        y = k(xs)
        y.block_until_ready()
        t0 = time.perf_counter()
        _ = np.asarray(y)
        d2h = time.perf_counter() - t0
        print(f"{sz >> 20:3d}MB  H2D {sz/h2d/1e6:7.1f} MB/s   "
              f"H2D(4 streams) {sz/h2d4/1e6:7.1f} MB/s   "
              f"D2H {sz/d2h/1e6:7.1f} MB/s")


def encode_breakdown():
    from tests import corpus
    from dsv1_tpu.constants import (RATE_CONTROL_CRF, SUBSAMP_420,
                                    quality_percent)
    from dsv1_tpu.models.encoder import EncoderConfig
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.ops.frame import np_yuv_split
    from dsv1_tpu.parallel import encode_stream_gops
    from dsv1_tpu.utils.yuv import frame_size

    w, h, subsamp, G = 352, 288, SUBSAMP_420, 12
    n_frames = 288
    yuv = corpus.make_clip(w, h, subsamp, n_frames, seed=11)
    fsz = frame_size(w, h, subsamp)
    frames = [np_yuv_split(np.frombuffer(yuv[i*fsz:(i+1)*fsz], np.uint8),
                           subsamp, w, h) for i in range(n_frames)]
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(85), gop=G,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=G-1)
    encode_stream_gops(frames, meta, cfg)  # compile
    for _ in range(3):
        t0 = time.perf_counter()
        encode_stream_gops(frames, meta, cfg)
        dt = time.perf_counter() - t0
        print(f"e2e: {n_frames/dt:6.1f} fps  ({dt*1e3:6.0f} ms)")

    # phase timings via instrumented single chunk
    from dsv1_tpu.parallel.gop import (_jit_batched, block_geometry,
                                       crf_quant)
    from dsv1_tpu.models.encoder import auto_pyramid_levels
    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    fn, unpack = _jit_batched(subsamp, w, h, G, cfg.quality, cfg.do_scd,
                              cfg.scene_change_delta, cfg.intra_pct_thresh,
                              cfg.stable_refresh, cfg.pyramid_levels, None)
    chunk = 4
    packed = np.frombuffer(yuv[:chunk*G*fsz], np.uint8) \
        .reshape(chunk, G, fsz)
    pal = np.zeros(chunk, np.int32)
    stab = np.zeros((chunk, nbh*nbv, 2), np.int32)
    ref = np.zeros(chunk, np.int32)
    from dsv1_tpu.parallel.gop import crf_quant
    qn = np.full((chunk, 2), crf_quant(cfg.quality), np.int32)
    blob = fn(packed, pal, stab, ref, qn)
    jax.block_until_ready(blob)
    R = 6
    t0 = time.perf_counter()
    for _ in range(R):
        blob = fn(packed, pal, stab, ref, qn)
        jax.block_until_ready(blob)
    t_disp = (time.perf_counter() - t0) / R
    t0 = time.perf_counter()
    for _ in range(R):
        host = jax.device_get(blob)
    t_d2h = (time.perf_counter() - t0) / R
    t0 = time.perf_counter()
    for _ in range(R):
        out = unpack(host)
    t_unpack = (time.perf_counter() - t0) / R
    nbytes = int(np.asarray(blob).nbytes)
    fpc = chunk * G
    print(f"per chunk of {fpc} frames: dispatch+compute {t_disp*1e3:6.1f} ms"
          f" | D2H {t_d2h*1e3:6.1f} ms ({nbytes/1e6:.2f} MB ="
          f" {nbytes/t_d2h/1e6:.1f} MB/s) | unpack {t_unpack*1e3:5.1f} ms")
    print(f"  -> per 288 frames: dispatch {t_disp*288/fpc*1e3:5.0f} ms,"
          f" D2H {t_d2h*288/fpc*1e3:5.0f} ms,"
          f" unpack {t_unpack*288/fpc*1e3:5.0f} ms")
    # input H2D share: 288 CIF frames
    a = np.stack([frames[i][0] for i in range(n_frames)])
    t0 = time.perf_counter()
    d = jax.device_put(a)
    d.block_until_ready()
    t_in = time.perf_counter() - t0
    print(f"input luma H2D for 288 frames: {t_in*1e3:.0f} ms"
          f" ({a.nbytes/t_in/1e6:.1f} MB/s)")


if __name__ == "__main__":
    bw_probe()
    encode_breakdown()
