"""Benchmark: the BASELINE.md metric set at the reference's headline
operating point (gop 12, qp 85 CRF — reference README.md:25-33) vs the
single-core reference C codec (`cc -O3`, the only baseline the reference
publishes; BASELINE.md).

Emits one JSON metric line each for (the driver parses the LAST line as
the headline metric, kept identical to rounds 1-2):

  encode_fps_1080p_gop12_qp85   e2e 1080p encode (file bytes in -> .dsv)
  device_fps_1080p_gop12_qp85   1080p encode, device compute only (the
                                tunneled axon link is a test-environment
                                artifact: ~25-45 MB/s vs real deployments
                                feeding from co-located storage)
  decode_fps_1080p_gop12_qp85   e2e 1080p decode of a reference stream
  device_decode_fps_1080p_...   1080p decode, device compute only
  decode_fps_cif_gop12_qp85     e2e CIF decode of a reference stream
  device_decode_fps_cif_...     CIF decode, device compute only
  device_fps_cif_gop12_qp85     CIF encode, device compute only
  encode_fps_cif_gop12_qp85     e2e CIF encode (headline)

Every e2e point carries "parity": encode streams byte-compare against
the reference binary's output at matched settings (verifying the Pallas
HME path on real hardware), decode output byte-compares against the
reference decoder.

Device points carry "hbm_frac": the fraction of the v5e HBM peak
(~819 GB/s) that the codec's MINIMUM algorithmic data movement
represents at the achieved fps — a roofline position. The floor model
(documented in _hbm_frac) counts one u8 pass of the pixels in + one u8
pass out plus one int32 write+read of every subband coefficient; a
small fraction means the chip is op-/latency-bound (many small fused
ops), not bandwidth-bound, and says how much headroom a
bandwidth-optimal implementation would still have.
"""

import json
import os
import subprocess
import time
from pathlib import Path

import numpy as np


def _enable_compile_cache():
    """Persist TPU compiles across bench runs. The env var alone does not
    work here: jax reads it when first imported, which the axon
    sitecustomize does at interpreter startup."""
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # explicit CPU smoke run: undo the sitecustomize axon override
        # (same trick as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent / "build"
                          / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _probe_device(timeout_s: int = 180):
    """Fail fast if the TPU tunnel is wedged: device init can block
    forever inside PJRT client creation, which would otherwise eat the
    caller's whole timeout budget."""
    import subprocess
    import sys
    r = subprocess.run(
        ["timeout", str(timeout_s), sys.executable, "-c",
         "import os, jax\n"
         "if os.environ.get('JAX_PLATFORMS') == 'cpu':\n"
         "    jax.config.update('jax_platforms', 'cpu')\n"
         "jax.devices()"], capture_output=True)
    if r.returncode != 0:
        print(f"FATAL: TPU device init did not complete in {timeout_s}s "
              f"(tunnel down?)", flush=True)
        raise SystemExit(3)


def _mk_point(w, h, n_frames, label):
    """Corpus + config + reference-binary baselines for one operating
    point. Returns a dict with frames/meta/cfg, reference fps numbers,
    the reference stream (parity oracle) and its decode."""
    from tests import corpus, oracle
    from dsv1_tpu.constants import (RATE_CONTROL_CRF, SUBSAMP_420,
                                    quality_percent)
    from dsv1_tpu.models.encoder import EncoderConfig
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.ops.frame import np_yuv_split
    from dsv1_tpu.utils.yuv import frame_size

    G = 12
    yuv = corpus.make_clip(w, h, SUBSAMP_420, n_frames, seed=11)
    fsz = frame_size(w, h, SUBSAMP_420)
    frames = [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                         np.uint8), SUBSAMP_420, w, h)
              for i in range(n_frames)]
    meta = Metadata(w, h, SUBSAMP_420)
    cfg = EncoderConfig(quality=quality_percent(85), gop=G,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=G - 1)

    oracle.build_oracle()
    tmp = Path("/tmp/dsv1_bench")
    tmp.mkdir(exist_ok=True)
    inp = tmp / f"in_{label}.yuv"
    inp.write_bytes(yuv)
    ref_dsv = tmp / f"ref_{label}.dsv"
    eargs = [str(oracle.BIN), "e", f"-inp_{inp}", f"-out_{ref_dsv}",
             f"-w{w}", f"-h{h}", "-fmt2", f"-nfr{n_frames}", f"-gop{G}",
             "-qp85", "-rc_mode1", f"-stabref{G-1}", "-y"]
    subprocess.run(eargs, check=True, capture_output=True)  # warm cache
    reps = 3 if w <= 704 else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        subprocess.run(eargs, check=True, capture_output=True)
    ref_efps = n_frames * reps / (time.perf_counter() - t0)

    ref_yuv = tmp / f"dec_{label}.yuv"
    dargs = [str(oracle.BIN), "d", f"-inp_{ref_dsv}", f"-out_{ref_yuv}",
             "-y"]
    subprocess.run(dargs, check=True, capture_output=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        subprocess.run(dargs, check=True, capture_output=True)
    ref_dfps = n_frames * reps / (time.perf_counter() - t0)

    return {"w": w, "h": h, "n": n_frames, "frames": frames, "meta": meta,
            "cfg": cfg, "ref_efps": ref_efps, "ref_dfps": ref_dfps,
            "ref_stream": ref_dsv.read_bytes(),
            "ref_decode": ref_yuv.read_bytes(), "label": label}


def _self_tune(pt):
    """Quick sweep over the no-recompile transfer knobs (the axon link's
    per-transfer behavior varies run to run); persisted tune.py results
    win, explicit env wins over both."""
    from dsv1_tpu.parallel import encode_stream_gops

    combos = [{}, {"DSV1_PREFETCH": "3"},
              {"DSV1_H2D_STREAMS": "4"},
              {"DSV1_PREFETCH": "3", "DSV1_H2D_STREAMS": "4"},
              {"DSV1_PREFETCH": "4", "DSV1_H2D_STREAMS": "8"}]

    def set_env(c):
        for k in ("DSV1_PREFETCH", "DSV1_H2D_STREAMS"):
            os.environ.pop(k, None)
        os.environ.update(c)

    tuned = Path(__file__).resolve().parent / "build" / "tune_best.json"
    if any(k in os.environ for c in combos for k in c):
        return  # explicit env wins
    if tuned.is_file():
        set_env(json.loads(tuned.read_text()))
        return
    best_c, best_t = {}, float("inf")
    for c in combos:
        set_env(c)
        t0 = time.perf_counter()
        encode_stream_gops(pt["frames"], pt["meta"], pt["cfg"])
        dt = time.perf_counter() - t0
        if dt < best_t:
            best_t, best_c = dt, dict(c)
    set_env(best_c)


def _device_only_fps(pt):
    """Encode fps with device-resident inputs and no host packing: the
    chunk-batched jitted encoder (the same executable the e2e path
    dispatches), measured with the in-jit repetition + differencing
    methodology of tools/devtime.py. Wall-clock dispatch timing through
    the tunneled axon link is unreliable (block_until_ready completes
    optimistically until a fetch forces sync, then every blocked call
    pays ~40-55 ms round trip); repeating the chunk inside one
    executable with a serial data dependency and differencing two rep
    counts cancels the fixed tunnel overhead. Measures what the chip
    sustains when the stream source/sink is not the tunneled link."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    import jax
    from devtime import devtime
    from dsv1_tpu.ops.frame import np_pack_planes
    from dsv1_tpu.parallel.gop import (_jit_batched, block_geometry,
                                       crf_quant)

    cfg, meta = pt["cfg"], pt["meta"]
    w, h, G = pt["w"], pt["h"], cfg.gop
    blk_w, blk_h, nbh, nbv = block_geometry(w, h)
    fn, _unpack = _jit_batched(meta.subsamp, w, h, G, cfg.quality,
                               cfg.do_scd, cfg.scene_change_delta,
                               cfg.intra_pct_thresh, cfg.stable_refresh,
                               cfg.pyramid_levels, None,
                               effort=cfg.effort)
    chunk = max(1, min(4, (4 * 352 * 288 * 12) // max(G * w * h, 1)))
    packed = np.stack([np_pack_planes(pt["frames"][i % pt["n"]])
                       for i in range(chunk * G)]).reshape(chunk, G, -1)
    args = tuple(jax.device_put(a) for a in (
        packed, np.zeros(chunk, np.int32),
        np.zeros((chunk, nbh * nbv, 2), np.int32),
        np.zeros(chunk, np.int32),
        np.full((chunk, 2), crf_quant(cfg.quality), np.int32)))
    sec_per_chunk = devtime(lambda *a: fn(*a), args, r1=1, r2=4)
    return chunk * G / max(sec_per_chunk, 1e-9)


V5E_HBM_BPS = 819e9  # v5e HBM peak bytes/s (public spec)


def _hbm_frac(w, h, fps):
    """Roofline position: minimum algorithmic HBM traffic at the
    achieved fps over the v5e HBM peak. Floor model per 4:2:0 frame
    (1.5*w*h pixels): one u8 read of the input pixels + one u8 write of
    the recon/output, plus one int32 write + one int32 read of every
    subband coefficient (the fwd transform must materialize them, the
    quantizer must consume them) => (1 + 1 + 4 + 4) * 1.5*w*h bytes.
    Everything else (pyramids, HME windows, half-pel variants, in-loop
    recon) is implementation, not algorithmic necessity. A small value
    = op-/latency-bound, with that much headroom to the memory
    roofline."""
    px = 1.5 * w * h
    bytes_per_frame = (1 + 1 + 4 + 4) * px
    return bytes_per_frame * fps / V5E_HBM_BPS


def _metric(name, fps, ref_fps, parity=None, hbm=None):
    m = {"metric": name, "value": round(fps, 2), "unit": "frames/s",
         "vs_baseline": round(fps / ref_fps, 3)}
    if parity is not None:
        m["parity"] = bool(parity)
    if hbm is not None:
        m["hbm_frac"] = round(hbm, 4)
    print(json.dumps(m), flush=True)


def _device_decode_fps(stream):
    """Decode fps with device-resident input (the shipped chunk
    executable, in-jit repetition; see _device_only_fps)."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    import jax
    from devtime import devtime
    from dsv1_tpu.parallel.decode import bench_device_chunk

    fn, blob_np, nf = bench_device_chunk(stream)
    blob = jax.device_put(blob_np)
    sec = devtime(lambda b: fn(b), (blob,), r1=1, r2=4)
    return nf / max(sec, 1e-9)


def main():
    _probe_device()
    _enable_compile_cache()
    from dsv1_tpu.parallel import decode_stream_gops, encode_stream_gops

    cif = _mk_point(352, 288, 288, "cif")
    encode_stream_gops(cif["frames"], cif["meta"], cif["cfg"])  # compile
    _self_tune(cif)

    # --- 1080p encode: e2e + device-only (the compute-bound point)
    hd = _mk_point(1920, 1080, 48, "1080p")
    stream_hd = encode_stream_gops(hd["frames"], hd["meta"],
                                   hd["cfg"])  # compile
    parity_hd = stream_hd == hd["ref_stream"]
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        stream_hd = encode_stream_gops(hd["frames"], hd["meta"], hd["cfg"])
    efps_hd = hd["n"] * reps / (time.perf_counter() - t0)
    _metric("encode_fps_1080p_gop12_qp85", efps_hd, hd["ref_efps"],
            parity_hd and stream_hd == hd["ref_stream"])
    dev_hd = _device_only_fps(hd)
    _metric("device_fps_1080p_gop12_qp85", dev_hd, hd["ref_efps"],
            hbm=_hbm_frac(hd["w"], hd["h"], dev_hd))

    # --- 1080p decode of the reference's own stream
    _, dec_hd = decode_stream_gops(hd["ref_stream"])  # compile
    parity_dec_hd = b"".join(
        np.asarray(p).tobytes() for f in dec_hd for p in f[1]) \
        == hd["ref_decode"]
    del dec_hd
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        decode_stream_gops(hd["ref_stream"])
    dfps_hd = hd["n"] * reps / (time.perf_counter() - t0)
    _metric("decode_fps_1080p_gop12_qp85", dfps_hd, hd["ref_dfps"],
            parity_dec_hd)
    ddev_hd = _device_decode_fps(hd["ref_stream"])
    _metric("device_decode_fps_1080p_gop12_qp85", ddev_hd, hd["ref_dfps"],
            hbm=_hbm_frac(hd["w"], hd["h"], ddev_hd))

    # --- 4K encode: device-only (BASELINE config 5's resolution; e2e
    # through the tunnel is upload-bound at ~12.4 MB/frame). Parity:
    # one e2e encode byte-compares vs the reference binary, verifying
    # the banded pallas HME path (ops/pallas_hme.py) on real hardware.
    uhd = _mk_point(3840, 2160, 12, "4k")
    stream_4k = encode_stream_gops(uhd["frames"], uhd["meta"], uhd["cfg"])
    dev_4k = _device_only_fps(uhd)
    _metric("device_fps_4k_gop12_qp85", dev_4k, uhd["ref_efps"],
            stream_4k == uhd["ref_stream"],
            hbm=_hbm_frac(uhd["w"], uhd["h"], dev_4k))

    # --- CIF decode of the reference's own stream
    _, dec = decode_stream_gops(cif["ref_stream"])  # compile
    parity_dec = b"".join(
        np.asarray(p).tobytes() for f in dec for p in f[1]) \
        == cif["ref_decode"]
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        decode_stream_gops(cif["ref_stream"])
    dfps = cif["n"] * reps / (time.perf_counter() - t0)
    _metric("decode_fps_cif_gop12_qp85", dfps, cif["ref_dfps"], parity_dec)
    ddev_cif = _device_decode_fps(cif["ref_stream"])
    _metric("device_decode_fps_cif_gop12_qp85", ddev_cif, cif["ref_dfps"],
            hbm=_hbm_frac(cif["w"], cif["h"], ddev_cif))

    # --- CIF device-only encode
    dev_cif = _device_only_fps(cif)
    _metric("device_fps_cif_gop12_qp85", dev_cif, cif["ref_efps"],
            hbm=_hbm_frac(cif["w"], cif["h"], dev_cif))

    # --- CIF e2e encode: the headline metric (LAST line, driver-parsed)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        stream = encode_stream_gops(cif["frames"], cif["meta"], cif["cfg"])
    fps = cif["n"] * reps / (time.perf_counter() - t0)
    _metric("encode_fps_cif_gop12_qp85", fps, cif["ref_efps"],
            stream == cif["ref_stream"])


if __name__ == "__main__":
    main()
