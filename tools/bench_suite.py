"""Benchmark suite for the SURVEY §6 metrics: encode + decode throughput
at CIF and 1080p vs the single-core reference C codec (cc -O3).

Run on the real TPU (no env overrides). Prints one human-readable table
plus a JSON line per metric. bench.py stays the driver's single-metric
entry point; this is the wider sweep for documentation.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / "build" / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def run_point(w, h, n_frames, gop, reps=3, label=""):
    from tests import corpus, oracle
    from dsv1_tpu.constants import (RATE_CONTROL_CRF, SUBSAMP_420,
                                    quality_percent)
    from dsv1_tpu.models.encoder import EncoderConfig
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.ops.frame import np_yuv_split
    from dsv1_tpu.parallel import decode_stream_gops, encode_stream_gops
    from dsv1_tpu.utils.yuv import frame_size

    yuv = corpus.make_clip(w, h, SUBSAMP_420, n_frames, seed=11)
    fsz = frame_size(w, h, SUBSAMP_420)
    frames = [np_yuv_split(np.frombuffer(yuv[i*fsz:(i+1)*fsz], np.uint8),
                           SUBSAMP_420, w, h) for i in range(n_frames)]
    meta = Metadata(w, h, SUBSAMP_420)
    cfg = EncoderConfig(quality=quality_percent(85), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)

    oracle.build_oracle()
    tmp = Path("/tmp/dsv1_bench_suite")
    tmp.mkdir(exist_ok=True)
    inp = tmp / f"in_{label}.yuv"
    inp.write_bytes(yuv)
    ref_dsv = tmp / f"ref_{label}.dsv"
    eargs = [str(oracle.BIN), "e", f"-inp_{inp}", f"-out_{ref_dsv}",
             f"-w{w}", f"-h{h}", "-fmt2", f"-nfr{n_frames}", f"-gop{gop}",
             "-qp85", "-rc_mode1", f"-stabref{gop-1}", "-y"]
    subprocess.run(eargs, check=True, capture_output=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        subprocess.run(eargs, check=True, capture_output=True)
    ref_efps = n_frames * reps / (time.perf_counter() - t0)
    dargs = [str(oracle.BIN), "d", f"-inp_{ref_dsv}",
             f"-out_{tmp/'d.yuv'}", "-y"]
    subprocess.run(dargs, check=True, capture_output=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        subprocess.run(dargs, check=True, capture_output=True)
    ref_dfps = n_frames * reps / (time.perf_counter() - t0)

    stream = encode_stream_gops(frames, meta, cfg)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        stream = encode_stream_gops(frames, meta, cfg)
    efps = n_frames * reps / (time.perf_counter() - t0)

    decode_stream_gops(stream)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        _, dec = decode_stream_gops(stream)
    dfps = n_frames * reps / (time.perf_counter() - t0)
    assert len(dec) == n_frames

    for metric, ours, ref in ((f"encode_fps_{label}", efps, ref_efps),
                              (f"decode_fps_{label}", dfps, ref_dfps)):
        print(json.dumps({"metric": metric, "value": round(ours, 2),
                          "unit": "frames/s",
                          "vs_baseline": round(ours / ref, 3)}))


if __name__ == "__main__":
    import os
    _cache()
    tuned = ROOT / "build" / "tune_best.json"
    if tuned.is_file():  # knob values from tools/tune.py's sweep
        for k, v in json.loads(tuned.read_text()).items():
            os.environ.setdefault(k, v)
    run_point(352, 288, 288, 12, label="cif_gop12_qp85")
    run_point(1920, 1080, 48, 12, label="1080p_gop12_qp85")
