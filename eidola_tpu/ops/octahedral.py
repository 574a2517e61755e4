"""Octahedral unit-vector <-> 32-bit codec (ref shaders/compress.glsl:31-180).

The reference compresses every G-buffer normal/tangent to a single uint32 via
snorm16x2 octahedral mapping; we keep the layout because the 20 B/px G-buffer
is a bandwidth feature (ref README.md:85-94).  All ops are vectorized jnp and
run on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def _oct_wrap(x, y):
    wx = (1.0 - jnp.abs(y)) * jnp.where(x >= 0.0, 1.0, -1.0)
    wy = (1.0 - jnp.abs(x)) * jnp.where(y >= 0.0, 1.0, -1.0)
    return wx, wy


def dir_to_oct(n):
    """Unit direction (..., 3) -> octahedral coords (..., 2) in [-1, 1]."""
    denom = jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + jnp.abs(n[..., 2])
    denom = jnp.maximum(denom, 1e-20)
    x = n[..., 0] / denom
    y = n[..., 1] / denom
    wx, wy = _oct_wrap(x, y)
    below = n[..., 2] < 0.0
    return jnp.stack([jnp.where(below, wx, x), jnp.where(below, wy, y)], axis=-1)


def oct_to_dir(o):
    """Octahedral coords (..., 2) in [-1,1] -> unit direction (..., 3)."""
    x = o[..., 0]
    y = o[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    wx, wy = _oct_wrap(x, y)
    below = z < 0.0
    x = jnp.where(below, wx, x)
    y = jnp.where(below, wy, y)
    v = jnp.stack([x, y, z], axis=-1)
    return v / jnp.maximum(
        jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), 1e-20
    )


def encode_unit_u32(n):
    """Unit direction -> packed snorm16x2 uint32."""
    o = dir_to_oct(n)
    q = jnp.round(jnp.clip(o, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    qu = (q & 0xFFFF).astype(jnp.uint32)
    return qu[..., 0] | (qu[..., 1] << jnp.uint32(16))


def decode_unit_u32(p):
    """Packed snorm16x2 uint32 -> unit direction."""
    p = p.astype(jnp.uint32)
    lo = (p & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = ((p >> jnp.uint32(16)) & jnp.uint32(0xFFFF)).astype(jnp.int32)
    # sign-extend 16-bit
    lo = jnp.where(lo >= 32768, lo - 65536, lo)
    hi = jnp.where(hi >= 32768, hi - 65536, hi)
    o = jnp.stack([lo, hi], axis=-1).astype(jnp.float32) / 32767.0
    return oct_to_dir(o)


def encode_unit_u32_np(n):
    """Pure-numpy encode_unit_u32 for host-side scene building (avoids a
    device round trip per attribute array during upload)."""
    import numpy as np

    n = np.asarray(n, np.float32)
    denom = np.maximum(
        np.abs(n[..., 0]) + np.abs(n[..., 1]) + np.abs(n[..., 2]), 1e-20
    )
    x = n[..., 0] / denom
    y = n[..., 1] / denom
    wx = (1.0 - np.abs(y)) * np.where(x >= 0.0, 1.0, -1.0)
    wy = (1.0 - np.abs(x)) * np.where(y >= 0.0, 1.0, -1.0)
    below = n[..., 2] < 0.0
    ox = np.where(below, wx, x)
    oy = np.where(below, wy, y)
    qx = np.round(np.clip(ox, -1.0, 1.0) * 32767.0).astype(np.int32)
    qy = np.round(np.clip(oy, -1.0, 1.0) * 32767.0).astype(np.int32)
    return (
        (qx & 0xFFFF).astype(np.uint32)
        | ((qy & 0xFFFF).astype(np.uint32) << np.uint32(16))
    )


def pack_unorm4x8_np(v):
    """Pure-numpy pack_unorm4x8 for host-side scene building."""
    import numpy as np

    q = np.round(np.clip(np.asarray(v), 0.0, 1.0) * 255.0).astype(np.uint32)
    return (
        q[..., 0]
        | (q[..., 1] << np.uint32(8))
        | (q[..., 2] << np.uint32(16))
        | (q[..., 3] << np.uint32(24))
    )


def pack_unorm4x8(v):
    """(..., 4) floats in [0,1] -> uint32 (like GLSL packUnorm4x8)."""
    q = jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    return (
        q[..., 0]
        | (q[..., 1] << jnp.uint32(8))
        | (q[..., 2] << jnp.uint32(16))
        | (q[..., 3] << jnp.uint32(24))
    )


def unpack_unorm4x8(p):
    p = p.astype(jnp.uint32)
    return (
        jnp.stack(
            [
                p & jnp.uint32(0xFF),
                (p >> jnp.uint32(8)) & jnp.uint32(0xFF),
                (p >> jnp.uint32(16)) & jnp.uint32(0xFF),
                (p >> jnp.uint32(24)) & jnp.uint32(0xFF),
            ],
            axis=-1,
        ).astype(jnp.float32)
        / 255.0
    )


def pack_albedo_hash(albedo, mat_hash):
    """Linear RGB in [0,1] (..., 3) + 8-bit hash -> uint32
    (ref direct_stage.comp:37-45: 24-bit albedo + 8-bit matHash)."""
    q = jnp.round(jnp.clip(albedo, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    return (
        q[..., 0]
        | (q[..., 1] << jnp.uint32(8))
        | (q[..., 2] << jnp.uint32(16))
        | ((mat_hash.astype(jnp.uint32) & jnp.uint32(0xFF)) << jnp.uint32(24))
    )


def unpack_albedo_hash(p):
    p = p.astype(jnp.uint32)
    albedo = (
        jnp.stack(
            [
                p & jnp.uint32(0xFF),
                (p >> jnp.uint32(8)) & jnp.uint32(0xFF),
                (p >> jnp.uint32(16)) & jnp.uint32(0xFF),
            ],
            axis=-1,
        ).astype(jnp.float32)
        / 255.0
    )
    mat_hash = (p >> jnp.uint32(24)) & jnp.uint32(0xFF)
    return albedo, mat_hash
