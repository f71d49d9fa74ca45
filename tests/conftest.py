"""Test configuration: run everything on a simulated 8-device CPU mesh.

The sandbox's sitecustomize imports jax at interpreter start and forces the
``axon`` (remote-TPU-tunnel) platform, so env vars set here are too late —
but the backend is not yet *initialized*, so ``jax.config.update`` still
wins.  Tests must run on a local 8-device CPU mesh: every remote dispatch is
a network round-trip, and the distributed tests need 8 devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (may already be imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite's wall clock is dominated by
# XLA:CPU compiles (same programs every run).  Cache executables across
# runs so re-runs pay tracing only.  Keyed by jax version + flags, so a
# toolchain bump invalidates it automatically.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
