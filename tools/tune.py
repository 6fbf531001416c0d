"""Sweep the encode-pipeline perf knobs on the real chip and report the
best combination for bench.py's operating point (CIF, gop 12, qp 85).

Knobs (env, read per encode call by parallel/gop.py):
  DSV1_PREFETCH        chunks dispatched ahead of host packing (default 2)
  DSV1_H2D_STREAMS     0 = implicit jit transfer, S >= 1 = explicit
                       device_put, split into S parallel streams
  DSV1_GOPS_PER_DEVICE per-device GOP batch (chunk shape -> recompile;
                       values > 4 crashed the axon worker in round 1, so
                       each new value is probed in a subprocess first)

Usage: python tools/tune.py  (run with the TPU tunnel up; ~5 min)
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _setup():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / "build" / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _workload():
    from tests import corpus
    from dsv1_tpu.constants import (RATE_CONTROL_CRF, SUBSAMP_420,
                                    quality_percent)
    from dsv1_tpu.models.encoder import EncoderConfig
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.ops.frame import np_yuv_split
    from dsv1_tpu.utils.yuv import frame_size
    import numpy as np

    w, h, subsamp, G = 352, 288, SUBSAMP_420, 12
    n = 288
    yuv = corpus.make_clip(w, h, subsamp, n, seed=11)
    fsz = frame_size(w, h, subsamp)
    frames = [np_yuv_split(np.frombuffer(yuv[i * fsz:(i + 1) * fsz],
                                         np.uint8), subsamp, w, h)
              for i in range(n)]
    meta = Metadata(w, h, subsamp)
    cfg = EncoderConfig(quality=quality_percent(85), gop=G,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=G - 1)
    return frames, meta, cfg, n


def _probe_chunk_size(per_dev: int) -> bool:
    """A too-large per-device batch can crash the axon worker (observed
    at 8 in round 1); try it in a throwaway subprocess so a crash cannot
    take down this process's device grant."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os; os.environ['DSV1_GOPS_PER_DEVICE'] = '%d'\n"
        "from tools.tune import _setup, _workload\n"
        "_setup()\n"
        "from dsv1_tpu.parallel import encode_stream_gops\n"
        "frames, meta, cfg, n = _workload()\n"
        "encode_stream_gops(frames[:%d], meta, cfg)\n"
        "print('OK')\n" % (str(ROOT), per_dev, per_dev * 12)
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=900)
    return r.returncode == 0 and b"OK" in r.stdout


def main():
    _setup()
    from dsv1_tpu.parallel import encode_stream_gops
    frames, meta, cfg, n = _workload()

    def run(env: dict, reps: int = 3) -> float:
        for k in ("DSV1_PREFETCH", "DSV1_H2D_STREAMS",
                  "DSV1_GOPS_PER_DEVICE"):
            os.environ.pop(k, None)
        os.environ.update({k: str(v) for k, v in env.items()})
        encode_stream_gops(frames, meta, cfg)  # warm-up / compile
        t0 = time.perf_counter()
        for _ in range(reps):
            encode_stream_gops(frames, meta, cfg)
        return n * reps / (time.perf_counter() - t0)

    results = []
    base = run({})
    results.append(("default", base))
    print(f"default: {base:6.1f} fps", flush=True)

    # no-recompile sweep: prefetch x h2d streams at the default chunk
    best_env, best = {}, base
    for pf in (2, 3, 4):
        for hs in (0, 1, 2, 4, 8, 16):
            env = {"DSV1_PREFETCH": pf, "DSV1_H2D_STREAMS": hs}
            fps = run(env)
            results.append((f"pf={pf} hs={hs}", fps))
            print(f"pf={pf} hs={hs}: {fps:6.1f} fps", flush=True)
            if fps > best:
                best_env, best = dict(env), fps

    # chunk-size sweep at the best transfer config (each value probed in
    # a subprocess first; recompiles once per value, persisted in the
    # jax cache)
    for pd in (2, 6, 8):
        if pd > 4 and not _probe_chunk_size(pd):
            print(f"gpd={pd}: crashed the worker in probe, skipping",
                  flush=True)
            continue
        env = dict(best_env, DSV1_GOPS_PER_DEVICE=pd)
        fps = run(env)
        results.append((f"{best_env} gpd={pd}", fps))
        print(f"gpd={pd} (+best): {fps:6.1f} fps", flush=True)
        if fps > best:
            best_env, best = dict(env), fps

    print(json.dumps({"best_env": best_env, "best_fps": round(best, 1),
                      "default_fps": round(base, 1)}))
    # persist for bench.py / tools/bench_suite.py (applied when the env
    # doesn't already set the knobs)
    out = ROOT / "build" / "tune_best.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({k: str(v) for k, v in best_env.items()}))


if __name__ == "__main__":
    main()
