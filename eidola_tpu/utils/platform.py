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
