"""Test harness: force an 8-device virtual CPU mesh before any backend
initialization so multi-chip sharding paths compile+run without real TPU
hardware (the driver validates the real-device path separately via
__graft_entry__). Note: the env image's sitecustomize pins
``jax_platforms=axon,cpu``; ``jax.config.update`` after import wins."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if os.environ.get("BUNMPC_TPU_TESTS"):
    # opt-in: run the TPU-gated tests compiled on the real chip (keeps the
    # sitecustomize platform list; product path is f32 so x64 stays off).
    # Serialize with any other TPU process — one owner per chip.
    jax.config.update("jax_enable_x64", False)
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is compile-bound (dozens of large
# jitted programs); warm runs skip straight to execution.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
