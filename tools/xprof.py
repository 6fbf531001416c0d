"""Device-side op profiling through the axon tunnel.

jax.profiler.trace captures real per-fusion TPU timings even over the
tunneled link (verified) — unlike wall-clock dispatch timing, which is
polluted by ~40-55 ms round trips (tools/devtime.py). This runs a
callable under the profiler and prints the top device fusions by time.

Usage:
    from xprof import xprof
    xprof(lambda: jax.block_until_ready(fn(*args)), top=30)
"""
import collections
import glob
import gzip
import json
import tempfile

import jax


def xprof(thunk, top: int = 30, warmup: bool = True):
    if warmup:
        thunk()
    d = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(d):
        thunk()
    fs = sorted(glob.glob(f"{d}/**/*.trace.json.gz", recursive=True))
    data = json.load(gzip.open(fs[-1]))
    ev = data.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            if name.startswith("jit_") or name.startswith("jit("):
                continue  # enclosing executable span
            durs[name] += e.get("dur", 0.0)
            counts[name] += 1
            total += e.get("dur", 0.0)
    print(f"device total {total/1e3:9.2f} ms over {sum(counts.values())} "
          f"op events")
    for name, us in durs.most_common(top):
        print(f"{us/1e3:9.2f} ms  x{counts[name]:<4d} {name[:90]}")
    return durs, total
