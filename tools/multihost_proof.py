"""Multi-process multi-host proof + scaling report (VERDICT item 4).

Launches N real OS processes through jax.distributed.initialize (CPU
devices — the same flow a TPU pod slice would run), each encoding its
GOP shard; ranks exchange stability state + shard bytes over the
distributed backend's allgather; rank 0 muxes. Verifies the muxed stream
byte-identical to the single-process sequential encoder and reports the
scaling-efficiency breakdown.

Scaling-efficiency note: this box has ONE physical core, so two local
processes cannot show wall-clock speedup — they timeshare the core. What
the flow proves is (a) the real multi-process path executes end to end,
and (b) the serial fraction (Amdahl bound) is tiny: the only work that
cannot parallelize across hosts is the rank-0 mux (an O(bytes) concat +
O(1) link patches per boundary, reference dsv_encoder.c:170-192) plus
the rare stability-handshake re-encode of boundary GOPs. The report
prints measured encode seconds per rank, mux seconds, and the implied
2-host efficiency  eff = T_enc / (T_enc + 2*T_mux)  at equal per-host
throughput (BASELINE.md asks >= 80%; the measured serial fraction puts
the bound far above that).

Usage: python tools/multihost_proof.py [nframes] [w] [h]
"""

import json
import socket
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    import os

    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 352
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 288
    gop, qp, cut = 12, 85, nframes // 2 - 2  # cut mid-GOP: handshake leg
    tmp = Path("/tmp/dsv1_mp_proof")
    tmp.mkdir(exist_ok=True)
    out = tmp / "mp.dsv"
    timing = tmp / "timing.json"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   str(ROOT / "build" / "jax_cpu_cache"))
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, "-m", "tests._mp_worker", str(r), "2", str(port),
         str(w), str(h), str(nframes), str(gop), str(qp), str(cut),
         str(out), str(timing)],
        cwd=ROOT, env=env, stderr=subprocess.PIPE) for r in range(2)]
    for p in procs:
        _, err = p.communicate(timeout=3600)
        if p.returncode != 0:
            print(err.decode()[-3000:])
            raise SystemExit(1)
    wall = time.perf_counter() - t0

    # single-process golden (sequential encoder)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dsv1_tpu.constants import RATE_CONTROL_CRF, SUBSAMP_420, \
        quality_percent
    from dsv1_tpu.models.encoder import EncoderConfig
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.parallel import encode_stream_gops
    from tests.corpus import make_clip_frames

    frames = make_clip_frames(w, h, SUBSAMP_420, nframes, seed=31,
                              cut_at=cut)
    meta = Metadata(w, h, SUBSAMP_420)
    cfg = EncoderConfig(quality=quality_percent(qp), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    t0 = time.perf_counter()
    single = encode_stream_gops(frames, meta, cfg)
    t_single = time.perf_counter() - t0
    ok = out.read_bytes() == single

    ts = [json.loads((tmp / f"timing.json.{r}").read_text())
          for r in range(2)]
    t_enc = max(t["encode_s"] for t in ts)
    t_mux = ts[0]["mux_s"]
    eff = t_enc / (t_enc + 2 * t_mux) if t_enc else 1.0
    print(json.dumps({
        "byte_identical": ok,
        "handshake_rounds": [t["handshake_rounds"] for t in ts],
        "encode_s_per_rank": [round(t["encode_s"], 3) for t in ts],
        "mux_s": round(t_mux, 6),
        "wall_s_2proc_1core": round(wall, 2),
        "single_proc_encode_s": round(t_single, 2),
        "amdahl_2host_efficiency": round(eff, 5),
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
