"""HDR environment importance sampling
(ref src/hdr_sampling.cpp:56-242; shaders/env_sampling.glsl:38-99).

Load-time (host): read a Radiance .hdr into linear RGB, weight each texel by
luminance * solid angle, and build one alias table over all texels — same
strategy as the reference's createEnvironmentAccel.  Device side: sampling is
two gathers (alias redirect) + a uniform direction within the chosen texel;
evaluation is a bilinear texture lookup by spherical uv.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.alias_table import make_alias_table, sample_alias
from ..ops.math import luminance, spherical_uv, uv_to_dir
from .data import EnvMap

_LUM = np.asarray([0.2126, 0.7152, 0.0722])


def load_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr (or EXR/PNG fallback) into (H, W, 3) float32
    linear RGB (ref hdr_sampling.cpp:56-99 via stb_image)."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        if img is not None:
            img = img[..., ::-1]  # BGR -> RGB
            return np.ascontiguousarray(img.astype(np.float32))
    except Exception:
        pass
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path), np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    return img[..., :3]


def build_env_map(image: np.ndarray) -> EnvMap:
    """Solid-angle-weighted luminance alias map over all texels
    (ref hdr_sampling.cpp:181-242)."""
    image = np.asarray(image, np.float32)
    H, W = image.shape[:2]
    lum = (image[..., :3] * _LUM).sum(-1)
    # equirect texel solid angle: (2pi/W)(pi/H) sin(theta)
    theta = (np.arange(H) + 0.5) / H * np.pi
    sin_t = np.sin(theta)[:, None]
    d_omega = (2.0 * np.pi / W) * (np.pi / H) * sin_t
    weights = lum * d_omega
    table, integral = make_alias_table(weights.ravel())
    average = integral / (4.0 * np.pi)
    return EnvMap(
        image=jnp.asarray(image[..., :3]),
        table=table,
        integral=jnp.asarray(integral, jnp.float32),
        average=jnp.asarray(average, jnp.float32),
    )


def env_eval(env: EnvMap, d, hdr_multiplier=1.0):
    """Radiance along direction d (bilinear; ref pathtrace.glsl:40-47)."""
    H, W = env.image.shape[:2]
    uv = spherical_uv(d)
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = (x0 + 1) % W
    x0 = x0 % W
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    img = env.image
    c00 = img[y0, x0]
    c01 = img[y0, x1]
    c10 = img[y1, x0]
    c11 = img[y1, x1]
    fx = fx[..., None]
    fy = fy[..., None]
    c = (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
    return c * hdr_multiplier


def env_pdf(env: EnvMap, d):
    """Solid-angle pdf of env_sample for direction d
    (ref pathtrace.glsl env pdf path)."""
    H, W = env.image.shape[:2]
    uv = spherical_uv(d)
    x = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
    flat = y * W + x
    pmf = env.table.pdf[flat]
    theta = (y.astype(jnp.float32) + 0.5) / H * jnp.pi
    d_omega = (2.0 * jnp.pi / W) * (jnp.pi / H) * jnp.maximum(jnp.sin(theta), 1e-6)
    return pmf / d_omega


def env_sample(env: EnvMap, u1, u2, u3, u4, hdr_multiplier=1.0):
    """Draw a direction ~ luminance.  Texel via alias table, then uniform
    within the texel (ref env_sampling.glsl:38-99).

    Returns (dir, pdf_solid_angle, radiance)."""
    H, W = env.image.shape[:2]
    flat, pmf = sample_alias(env.table, u1, u2)
    y = flat // W
    x = flat % W
    # uniform sub-texel position
    u = (x.astype(jnp.float32) + u3) / W
    v = (y.astype(jnp.float32) + u4) / H
    d = uv_to_dir(jnp.stack([u, v], axis=-1))
    theta = (y.astype(jnp.float32) + 0.5) / H * jnp.pi
    d_omega = (2.0 * jnp.pi / W) * (jnp.pi / H) * jnp.maximum(jnp.sin(theta), 1e-6)
    pdf = pmf / d_omega
    rad = env.image[y, x] * hdr_multiplier
    return d, pdf, rad
