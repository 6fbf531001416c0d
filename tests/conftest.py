"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Env must be set before the first jax *backend initialization* in the test
process (imports are fine; XLA_FLAGS and the compilation cache are read
lazily when the backend is created).
"""

import os
from pathlib import Path

# force, not setdefault: the shell exports JAX_PLATFORMS=axon (real TPU)
# globally, and the tests must run on the virtual CPU mesh regardless
os.environ["JAX_PLATFORMS"] = "cpu"
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

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter startup, which overrides the env var; undo
# it before any backend is initialized (a hung TPU relay would otherwise
# hang every jax.devices() call, CPU-pinned or not).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
