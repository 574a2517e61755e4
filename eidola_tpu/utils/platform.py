"""Platform selection helper.

Some environments register an out-of-tree TPU plugin that wins over a plain
`JAX_PLATFORMS` env override; forcing the platform through jax.config is
authoritative.  Call early, before any device is touched.
"""
from __future__ import annotations

import os

import jax


def honor_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        try:
            jax.config.update("jax_platforms", plat.split(",")[0])
        except Exception:
            pass


def enable_compile_cache(root: str | None = None) -> None:
    """Persistent XLA compile cache: full-frame TPU compiles over the
    tunnel run 1-8 min; repeat runs (bench, perf tools, driver checks)
    reuse the compiled executable instead.  Call before first compile."""
    if root is None:
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", root)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jaxlib without the persistent cache knobs
