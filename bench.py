"""Benchmark: CIF encode throughput at the reference's headline operating
point (352x288, gop 12, qp 85 — reference README.md:25-33) vs the
single-core reference C encoder (`cc -O3`, the only baseline the reference
publishes; BASELINE.md).

Prints one JSON line:
  {"metric": "encode_fps_cif_gop12_qp85", "value": fps, "unit": "frames/s",
   "vs_baseline": fps / reference_fps}
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


def main():
    _probe_device()
    _enable_compile_cache()
    from tests import corpus, oracle
    from dsv1_tpu.constants import (RATE_CONTROL_CRF, SUBSAMP_420,
                                    quality_percent)
    from dsv1_tpu.models.encoder import EncoderConfig
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.ops.frame import np_yuv_split
    from dsv1_tpu.parallel import encode_stream_gops
    from dsv1_tpu.utils.yuv import frame_size

    w, h, subsamp, G = 352, 288, SUBSAMP_420, 12
    n_frames = 288  # 24 GOPs (steady state past compile/pipeline warm-up)
    yuv = corpus.make_clip(w, h, subsamp, n_frames, seed=11)
    fsz = frame_size(w, h, subsamp)
    frames = [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                         np.uint8), subsamp, w, h)
              for i in range(n_frames)]
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(85), gop=G,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=G - 1)

    # --- baseline: reference C encoder, single core (cc -O3)
    oracle.build_oracle()
    tmp = Path("/tmp/dsv1_bench")
    tmp.mkdir(exist_ok=True)
    inp = tmp / "in.yuv"
    inp.write_bytes(yuv)
    args = [str(oracle.BIN), "e", f"-inp_{inp}", f"-out_{tmp/'o.dsv'}",
            f"-w{w}", f"-h{h}", "-fmt2", f"-nfr{n_frames}", f"-gop{G}",
            "-qp85", "-rc_mode1", f"-stabref{G-1}", "-y"]
    subprocess.run(args, check=True, capture_output=True)  # warm cache
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        subprocess.run(args, check=True, capture_output=True)
    ref_fps = n_frames * reps / (time.perf_counter() - t0)

    # --- ours: GOP-parallel TPU path (compile once, then steady state)
    encode_stream_gops(frames, meta, cfg)  # warm-up / compile

    # quick self-tune over the no-recompile transfer knobs (the axon
    # link's per-transfer behavior varies; one probe rep per combo)
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
        pass  # explicit env wins
    elif tuned.is_file():
        # tools/tune.py already swept the knobs on this hardware
        set_env(json.loads(tuned.read_text()))
    else:
        best_c, best_t = {}, float("inf")
        for c in combos:
            set_env(c)
            t0 = time.perf_counter()
            encode_stream_gops(frames, meta, cfg)
            dt = time.perf_counter() - t0
            if dt < best_t:
                best_t, best_c = dt, dict(c)
        set_env(best_c)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        stream = encode_stream_gops(frames, meta, cfg)
    fps = n_frames * reps / (time.perf_counter() - t0)
    assert len(stream) > 0

    print(json.dumps({
        "metric": "encode_fps_cif_gop12_qp85",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 3),
    }))


if __name__ == "__main__":
    main()
