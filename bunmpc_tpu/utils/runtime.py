"""Process-level JAX runtime setup shared by the CLI drivers."""

from __future__ import annotations

import os


def setup_jax(cache: bool = True) -> None:
    """Honor ``JAX_PLATFORMS`` and enable the persistent compilation cache.

    Must run before first backend use. The env image's sitecustomize pins
    ``jax_platforms`` via ``jax.config`` (the env var alone is overridden),
    so ``JAX_PLATFORMS=cpu python scripts/...`` silently lands on the TPU
    without this re-application — which both corrupts TPU timings of a
    concurrent benchmark and breaks the only-one-TPU-process rule.
    """
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if cache:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        d = os.path.join(repo, ".jax_cache")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
