"""Texture sampling from the padded stack
(replaces Vulkan combined image samplers, ref scene.cpp:554-646;
SURVEY hard-part #3).

All textures live in one (NT, TH, TW, 4) array; a sample is 4 gathers +
bilinear mix, uniform across lanes regardless of which texture each lane
addresses — that uniformity is the point of the padded-stack layout.
"""
from __future__ import annotations

import jax.numpy as jnp

from .data import TexStack


def sample_bilinear(stack: TexStack, tex_id, uv):
    """Bilinear RGBA fetch with repeat wrapping.

    tex_id: (...,) i32 (values < 0 return white — "no texture");
    uv: (..., 2) f32.
    """
    tid = jnp.maximum(tex_id, 0)
    hw = stack.size[tid]  # (..., 2)
    h = hw[..., 0].astype(jnp.float32)
    w = hw[..., 1].astype(jnp.float32)

    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fx = (u - x0f)[..., None]
    fy = (v - y0f)[..., None]

    wi = hw[..., 1]
    hi = hw[..., 0]
    x0 = jnp.mod(x0f.astype(jnp.int32), wi)
    x1 = jnp.mod(x0 + 1, wi)
    y0 = jnp.mod(y0f.astype(jnp.int32), hi)
    y1 = jnp.mod(y0 + 1, hi)

    img = stack.data
    c00 = img[tid, y0, x0]
    c01 = img[tid, y0, x1]
    c10 = img[tid, y1, x0]
    c11 = img[tid, y1, x1]
    c = (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
    none = (tex_id < 0)[..., None]
    return jnp.where(none, jnp.ones_like(c), c)
