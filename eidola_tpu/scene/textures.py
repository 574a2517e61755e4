"""Texture sampling from the padded mip-atlas stack
(replaces Vulkan combined image samplers: per-texture wrap modes + full mip
chains, ref scene.cpp:554-646; SURVEY hard-part #3).

All textures live in one (NT, TH, 2*TW, 4) array (level-0 plane + side-by-
side mip atlas, see data.TexStack); a sample is 4 gathers + bilinear mix
per mip level, uniform across lanes regardless of which texture or level
each lane addresses — that uniformity is the point of the layout.
"""
from __future__ import annotations

import jax.numpy as jnp

from .data import TexStack, WRAP_CLAMP, WRAP_MIRROR


def _wrap_coord(x, n, mode):
    """Apply per-lane wrap mode to integer texel coords.

    x: (...,) i32 unbounded; n: (...,) i32 extent; mode: (...,) i32 WRAP_*.
    """
    rep = jnp.mod(x, n)
    clamp = jnp.clip(x, 0, n - 1)
    # mirrored repeat: period 2n, reflect the second half
    m = jnp.mod(x, jnp.maximum(2 * n, 1))
    mir = jnp.where(m >= n, 2 * n - 1 - m, m)
    out = jnp.where(mode == WRAP_CLAMP, clamp, rep)
    return jnp.where(mode == WRAP_MIRROR, mir, out)


def _bilinear_level(stack: TexStack, tid, uv, level):
    """Bilinear fetch at integer mip `level` (per-lane i32)."""
    tw_stack = stack.data.shape[2] // 2
    hw = stack.size[tid]
    # ceil halving to match _mip_down storage (odd extents are edge-padded
    # before each reduction, so stored level-k extent = ceil(size / 2^k))
    h = jnp.maximum((hw[..., 0] + (1 << level) - 1) >> level, 1)
    w = jnp.maximum((hw[..., 1] + (1 << level) - 1) >> level, 1)
    wrap = stack.wrap[tid]
    # x offset of the level within the atlas (0 for level 0)
    xoff = jnp.where(
        level == 0, 0, 2 * tw_stack - (tw_stack >> jnp.maximum(level - 1, 0))
    )

    u = uv[..., 0] * w.astype(jnp.float32) - 0.5
    v = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fx = (u - x0f)[..., None]
    fy = (v - y0f)[..., None]

    x0i = x0f.astype(jnp.int32)
    y0i = y0f.astype(jnp.int32)
    x0 = _wrap_coord(x0i, w, wrap[..., 0])
    x1 = _wrap_coord(x0i + 1, w, wrap[..., 0])
    y0 = _wrap_coord(y0i, h, wrap[..., 1])
    y1 = _wrap_coord(y0i + 1, h, wrap[..., 1])

    img = stack.data
    c00 = img[tid, y0, xoff + x0]
    c01 = img[tid, y0, xoff + x1]
    c10 = img[tid, y1, xoff + x0]
    c11 = img[tid, y1, xoff + x1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (
        c10 * (1 - fx) + c11 * fx
    ) * fy


def sample_texture(stack: TexStack, tex_id, uv, lod=None, footprint=None):
    """RGBA fetch with wrap modes and optional trilinear mip filtering.

    tex_id: (...,) i32 (values < 0 return white — "no texture");
    uv: (..., 2) f32; lod: (...,) f32 mip level (None = level 0, the
    reference's behaviour: its shading uses textureLod(..., 0),
    gltf_material.glsl); footprint: (...,) f32 uv-space sample diameter —
    converted to a per-texture lod (log2 of texel coverage).
    """
    # untextured scene: the stack is the 1x1 white dummy (real textures are
    # padded to >= 2x2 in make_tex_stack) — skip every gather STATICALLY.
    # Measured 227 ms/frame of pointless dummy-texel gathers at 1080p
    # otherwise (docs/PERF_NOTES.md).
    if stack.data.shape[0] == 1 and stack.data.shape[1] == 1:
        return jnp.ones(tex_id.shape + (4,), jnp.float32)

    tid = jnp.maximum(tex_id, 0)
    if footprint is not None:
        hw = stack.size[tid]
        res = jnp.maximum(hw[..., 0], hw[..., 1]).astype(jnp.float32)
        lod = jnp.log2(jnp.maximum(footprint * res, 1.0))
    if lod is None:
        c = _bilinear_level(stack, tid, uv, jnp.zeros(tid.shape, jnp.int32))
    else:
        tw_stack = stack.data.shape[2] // 2
        max_l = max(int(tw_stack).bit_length() - 1, 0)
        # each texture only stores its OWN chain down to 1x1: clamp the
        # per-lane lod to ceil(log2(max own extent)) or small textures in a
        # mixed-size stack would gather zero-filled atlas texels (black)
        hw = stack.size[tid]
        res = jnp.maximum(hw[..., 0], hw[..., 1]).astype(jnp.float32)
        max_l_tex = jnp.ceil(jnp.log2(jnp.maximum(res, 1.0))).astype(jnp.int32)
        max_l_tex = jnp.minimum(max_l_tex, max_l)
        lod = jnp.clip(lod, 0.0, max_l_tex.astype(jnp.float32))
        l0 = jnp.floor(lod).astype(jnp.int32)
        fl = (lod - l0.astype(jnp.float32))[..., None]
        c0 = _bilinear_level(stack, tid, uv, l0)
        c1 = _bilinear_level(stack, tid, uv, jnp.minimum(l0 + 1, max_l_tex))
        c = c0 * (1.0 - fl) + c1 * fl
    none = (tex_id < 0)[..., None]
    return jnp.where(none, jnp.ones_like(c), c)


def sample_bilinear(stack: TexStack, tex_id, uv, lod=None, footprint=None):
    """Back-compat name; see sample_texture."""
    return sample_texture(stack, tex_id, uv, lod, footprint)
