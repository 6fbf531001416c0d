"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env before the first jax import anywhere in the test process.
"""

import os
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the big GOP-scan graphs take tens of
# seconds to compile on CPU and the CLI tests pay it again in every
# subprocess (the env propagates there via os.environ.copy()).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / "build" / "jax_cpu_cache"),
)
