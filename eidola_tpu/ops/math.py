"""Shared math helpers (ref shaders/common.glsl, shaders/globals.glsl).

Everything here is pure jnp, broadcastable over arbitrary leading (pixel/ray)
dimensions; vectors are stored in the trailing axis of size 3.
"""
from __future__ import annotations

import jax.numpy as jnp

INFINITY = 1e28          # ref globals.glsl:27 (sentinel "no hit" distance)
EPS = 1e-4
INVALID_MAT_ID = jnp.uint32(0xFF000000)  # ref globals.glsl:106


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def length(v):
    return jnp.sqrt(jnp.maximum(dot3(v, v), 0.0))


def normalize(v, eps: float = 1e-20):
    return v * jnp.reciprocal(jnp.maximum(length(v), eps))[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def luminance(c):
    """CIE luminance of linear RGB (ref src/tools.hpp:58-61)."""
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


def make_frame(n):
    """Build an orthonormal (tangent, bitangent, n) frame from a unit normal.

    Branchless Frisvad/Duff construction (ref shaders/common.glsl:80-92 uses
    an equivalent local-frame helper).  Returns (t, b), each shaped like n.
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_world(t, b, n, v):
    """Local (tangent-space) direction -> world."""
    return t * v[..., 0:1] + b * v[..., 1:2] + n * v[..., 2:3]


def to_local(t, b, n, v):
    return jnp.stack([dot3(v, t), dot3(v, b), dot3(v, n)], axis=-1)


def offset_ray(p, n):
    """Self-intersection-safe ray origin offset (ref common.glsl:98-113).

    Integer-bit nudge of the position along the geometric normal, matching
    the Ray Tracing Gems "A Fast and Robust Method for Avoiding
    Self-Intersection" recipe the reference uses.
    """
    int_scale = 256.0
    float_scale = 1.0 / 65536.0
    origin_thresh = 1.0 / 32.0

    of_i = (int_scale * n).astype(jnp.int32)
    p_bits = p.view(jnp.int32)
    p_i = jnp.where(p < 0.0, p_bits - of_i, p_bits + of_i).view(jnp.float32)
    return jnp.where(jnp.abs(p) < origin_thresh, p + float_scale * n, p_i)


def spherical_uv(v):
    """Unit direction -> equirect uv (ref common.glsl:68-75)."""
    theta = jnp.arccos(jnp.clip(v[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(v[..., 2], v[..., 0])
    u = phi * (0.5 / jnp.pi) + 0.5
    w = theta / jnp.pi
    return jnp.stack([u, w], axis=-1)


def uv_to_dir(uv):
    """Inverse of spherical_uv."""
    phi = (uv[..., 0] - 0.5) * (2.0 * jnp.pi)
    theta = uv[..., 1] * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)], axis=-1)


def concentric_sample_disk(u1, u2):
    """Concentric disk mapping (ref common.glsl:171-175)."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    sx = jnp.where(use_x, ox, oy)
    denom = jnp.where(use_x, ox, oy)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    ratio = jnp.where(use_x, oy / denom, ox / denom)
    theta = jnp.where(
        use_x, (jnp.pi / 4.0) * ratio, (jnp.pi / 2.0) - (jnp.pi / 4.0) * ratio
    )
    r = jnp.where(zero, 0.0, sx)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cosine_sample_hemisphere(u1, u2):
    """Cosine-weighted hemisphere direction via concentric disk
    (ref pbr_metallicworkflow.glsl:22-26)."""
    x, y = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def power_heuristic(f, g):
    """MIS power heuristic, beta=2 (ref common.glsl:177-180)."""
    f2 = f * f
    return jnp.where(f2 + g * g > 0.0, f2 / jnp.maximum(f2 + g * g, 1e-30), 0.0)


def hdr_to_ldr(c):
    """x/(1+x) range compression applied around denoising
    (ref common.glsl:194-200)."""
    return c / (1.0 + c)


def ldr_to_hdr(c):
    """Inverse of hdr_to_ldr (ref common.glsl:194-200)."""
    return c / jnp.maximum(1.0 - c, 1e-6)


def clamp_radiance(c, clamp_val):
    """Firefly clamp: scale the colour so its max channel <= clamp_val
    (ref pathtrace.glsl:222-232)."""
    m = jnp.max(c, axis=-1, keepdims=True)
    scale = jnp.where(m > clamp_val, clamp_val / jnp.maximum(m, 1e-20), 1.0)
    return c * scale


def safe_div(a, b, eps: float = 1e-20):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def hash8bit(mat_id):
    """8-bit material hash used as a denoiser edge gate
    (ref common.glsl:141-143). mat_id: uint32."""
    x = mat_id.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    return (x >> jnp.uint32(24)).astype(jnp.uint32)
