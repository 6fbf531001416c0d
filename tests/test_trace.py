"""Profiling hooks (utils/trace.py): CLI -prof_ writes a JAX profiler
trace; StageTimer accounts per-stage wall time."""

import glob

from dsv1_tpu import cli
from dsv1_tpu.constants import SUBSAMP_420
from dsv1_tpu.utils.trace import StageTimer

from . import corpus


def test_cli_prof_writes_trace(tmp_path):
    w, h, n = 48, 32, 3
    (tmp_path / "in.yuv").write_bytes(corpus.make_clip(w, h, SUBSAMP_420,
                                                       n, seed=1))
    trace_dir = tmp_path / "trace"
    rc = cli.encode_main([f"-inp_{tmp_path/'in.yuv'}",
                          f"-out_{tmp_path/'o.dsv'}", f"-w{w}", f"-h{h}",
                          "-fmt2", f"-nfr{n}", "-gop2", "-qp85",
                          "-rc_mode1", f"-prof_{trace_dir}", "-y"])
    assert rc == 0
    assert (tmp_path / "o.dsv").stat().st_size > 0
    # the profiler writes .xplane.pb under plugins/profile/<run>/
    files = glob.glob(str(trace_dir / "plugins" / "profile" / "**" / "*"),
                      recursive=True)
    assert any(f.endswith((".xplane.pb", ".trace.json.gz")) for f in files)


def test_cli_prof_decode_writes_trace(tmp_path):
    w, h, n = 48, 32, 3
    (tmp_path / "in.yuv").write_bytes(corpus.make_clip(w, h, SUBSAMP_420,
                                                       n, seed=1))
    assert cli.encode_main([f"-inp_{tmp_path/'in.yuv'}",
                            f"-out_{tmp_path/'o.dsv'}", f"-w{w}", f"-h{h}",
                            "-fmt2", f"-nfr{n}", "-gop2", "-qp85",
                            "-rc_mode1", "-y"]) == 0
    tdir = tmp_path / "dtrace"
    assert cli.decode_main([f"-inp_{tmp_path/'o.dsv'}",
                            f"-out_{tmp_path/'d.yuv'}",
                            f"-prof_{tdir}", "-y"]) == 0
    files = glob.glob(str(tdir / "plugins" / "profile" / "**" / "*"),
                      recursive=True)
    assert any(f.endswith((".xplane.pb", ".trace.json.gz")) for f in files)


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("pack", n_items=10):
        pass
    with t.stage("pack", n_items=5):
        pass
    with t.stage("fetch"):
        pass
    rep = t.report()
    assert "pack" in rep and "fetch" in rep
    assert t.counts["pack"] == 15
