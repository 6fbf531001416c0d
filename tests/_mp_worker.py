"""Worker process for the real multi-process multi-host flow.

Launched once per rank by tests/test_multihost.py and
tools/multihost_proof.py:

    python -m tests._mp_worker <rank> <nprocs> <port> <w> <h> <nframes>
                               <gop> <qp_pct> <cut_at> <out> <timing_out>

Builds the shared deterministic corpus, runs
parallel.multihost.run_distributed_shard (jax.distributed.initialize +
allgather shard exchange + optimistic stability handshake + rank-0 mux),
writes the muxed stream to <out> (rank 0) and a timing JSON per rank to
<timing_out>.<rank>. cut_at >= 0 inserts a hard scene cut before that
frame (exercises the handshake's re-encode leg).
"""

import json
import os
import sys


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    (rank, nprocs, port, w, h, nframes, gop, qp_pct,
     cut_at) = (int(a) for a in sys.argv[1:10])
    out, timing_out = sys.argv[10], sys.argv[11]

    from dsv1_tpu.constants import RATE_CONTROL_CRF, SUBSAMP_420, \
        quality_percent
    from dsv1_tpu.models.encoder import EncoderConfig
    from dsv1_tpu.models.metadata import Metadata
    from dsv1_tpu.parallel.multihost import run_distributed_shard
    from tests.corpus import make_clip_frames

    frames = make_clip_frames(w, h, SUBSAMP_420, nframes, seed=31,
                              cut_at=cut_at)
    meta = Metadata(w, h, SUBSAMP_420)
    cfg = EncoderConfig(quality=quality_percent(qp_pct), gop=gop,
                        rc_mode=RATE_CONTROL_CRF, stable_refresh=gop - 1)
    stream, (enc_s, rounds, mux_s) = run_distributed_shard(
        f"localhost:{port}", nprocs, rank, frames, meta, cfg,
        out_path=(out if rank == 0 else None))
    with open(f"{timing_out}.{rank}", "w") as f:
        json.dump({"rank": rank, "encode_s": enc_s,
                   "handshake_rounds": rounds, "mux_s": mux_s}, f)


if __name__ == "__main__":
    main()
