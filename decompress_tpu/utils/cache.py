"""Persistent XLA compile cache for the framework's kernels.

The codec kernels have a handful of large compiled variants (per level
and segment size); caching them on disk makes every process after the
first start instantly.  Enabled automatically by ``decompress_tpu.ops``
unless ``DECOMPRESS_TPU_NO_CACHE`` is set.
"""

from __future__ import annotations

import os
import pathlib

_DONE = False


def enable_compile_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE or os.environ.get("DECOMPRESS_TPU_NO_CACHE"):
        return
    import jax

    # framework-level platform override (the axon sitecustomize force-sets
    # JAX_PLATFORMS, so an ordinary env var cannot select the CPU backend)
    plat = os.environ.get("DECOMPRESS_TPU_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        _DONE = True
        return  # caller (e.g. test conftest) already configured one
    cache_dir = path or os.environ.get(
        "DECOMPRESS_TPU_CACHE_DIR",
        str(pathlib.Path.home() / ".cache" / "decompress_tpu" / "jax"),
    )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _DONE = True
