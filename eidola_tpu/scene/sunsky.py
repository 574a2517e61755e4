"""Procedural Preetham-style analytic sun & sky
(ref shaders/sun_and_sky.glsl:141-601; defaults sample_example.hpp:186-203).

Implements the published Preetham/Perez daylight model directly from the
paper's polynomials (public constants), plus a physically-scaled sun disk
and a ground/horizon blend, vectorized jnp over direction arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.math import dot3, normalize
from .data import SunSkyParams

# sRGB D65 XYZ->RGB
_XYZ2RGB = jnp.asarray(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    jnp.float32,
)


def _perez(theta_cos, gamma, gamma_cos, A, B, C, D, E):
    theta_cos = jnp.maximum(theta_cos, 0.01)
    return (1.0 + A * jnp.exp(B / theta_cos)) * (
        1.0 + C * jnp.exp(D * gamma) + E * gamma_cos * gamma_cos
    )


def _zenith_chromaticity(T, ts):
    t2, t3 = ts * ts, ts * ts * ts
    xz = (
        T * T * (0.00166 * t3 - 0.00375 * t2 + 0.00209 * ts)
        + T * (-0.02903 * t3 + 0.06377 * t2 - 0.03202 * ts + 0.00394)
        + (0.11693 * t3 - 0.21196 * t2 + 0.06052 * ts + 0.25886)
    )
    yz = (
        T * T * (0.00275 * t3 - 0.00610 * t2 + 0.00317 * ts)
        + T * (-0.04214 * t3 + 0.08970 * t2 - 0.04153 * ts + 0.00516)
        + (0.15346 * t3 - 0.26756 * t2 + 0.06670 * ts + 0.26688)
    )
    return xz, yz


def sky_radiance(p: SunSkyParams, d):
    """Sky dome radiance for unit directions d (..., 3), linear RGB.

    Perez luminance/chromaticity distribution with the sun disk added and a
    ground blend below the horizon (ref sun_and_sky.glsl:167-251, 453-601).
    """
    T = p.turbidity
    sun = normalize(p.sun_direction)
    cos_theta = jnp.clip(d[..., 1], -1.0, 1.0)        # view zenith cos
    cos_gamma = jnp.clip(dot3(d, sun), -1.0, 1.0)     # angle to sun
    gamma = jnp.arccos(cos_gamma)
    theta_s = jnp.arccos(jnp.clip(sun[1], -1.0, 1.0))  # sun zenith angle

    # Perez coefficients (Preetham table)
    AY, BY = 0.1787 * T - 1.4630, -0.3554 * T + 0.4275
    CY, DY, EY = -0.0227 * T + 5.3251, 0.1206 * T - 2.5771, -0.0670 * T + 0.3703
    Ax, Bx = -0.0193 * T - 0.2592, -0.0665 * T + 0.0008
    Cx, Dx, Ex = -0.0004 * T + 0.2125, -0.0641 * T - 0.8989, -0.0033 * T + 0.0452
    Ay, By = -0.0167 * T - 0.2608, -0.0950 * T + 0.0092
    Cy, Dy, Ey = -0.0079 * T + 0.2102, -0.0441 * T - 1.6537, -0.0109 * T + 0.0529

    chi = (4.0 / 9.0 - T / 120.0) * (jnp.pi - 2.0 * theta_s)
    Yz = (4.0453 * T - 4.9710) * jnp.tan(chi) - 0.2155 * T + 2.4192  # kcd/m^2
    Yz = jnp.maximum(Yz, 0.0)
    xz, yz = _zenith_chromaticity(T, theta_s)

    cos_ts = jnp.cos(theta_s)
    denomY = _perez(jnp.asarray(1.0), theta_s, cos_ts, AY, BY, CY, DY, EY)
    denomx = _perez(jnp.asarray(1.0), theta_s, cos_ts, Ax, Bx, Cx, Dx, Ex)
    denomy = _perez(jnp.asarray(1.0), theta_s, cos_ts, Ay, By, Cy, Dy, Ey)

    ct = jnp.maximum(cos_theta, 0.01)
    Y = Yz * _perez(ct, gamma, cos_gamma, AY, BY, CY, DY, EY) / denomY
    x = xz * _perez(ct, gamma, cos_gamma, Ax, Bx, Cx, Dx, Ex) / denomx
    y = yz * _perez(ct, gamma, cos_gamma, Ay, By, Cy, Dy, Ey) / denomy

    # xyY -> XYZ -> RGB; scale kcd/m^2 into scene radiance units
    y = jnp.maximum(y, 1e-4)
    X = x / y * Y
    Z = (1.0 - x - y) / y * Y
    xyz = jnp.stack([X, Y, Z], axis=-1)
    rgb = jnp.maximum(xyz @ _XYZ2RGB.T, 0.0) * (0.035 * p.sun_intensity)
    rgb = rgb * p.sky_tint

    # ground blend below horizon (ref sun_and_sky.glsl ground/horizon blend)
    horizon = jnp.clip(cos_theta / 0.05, -1.0, 1.0) * 0.5 + 0.5
    ground = p.ground_color * (0.2 * p.sun_intensity) * jnp.maximum(sun[1], 0.05)
    rgb = rgb * horizon[..., None] + ground * (1.0 - horizon[..., None])

    # sun disk + glow (ref sun_and_sky.glsl:453-601)
    sun_rad = sun_disk_radiance(p)
    in_disk = cos_gamma > jnp.cos(p.sun_angular_radius)
    glow = jnp.exp(-(gamma / (p.sun_angular_radius * 4.0)) ** 2) * 0.1
    rgb = rgb + sun_rad * (
        in_disk.astype(jnp.float32) + glow * (~in_disk).astype(jnp.float32)
    )[..., None] * jnp.maximum(cos_theta + 0.1, 0.0)[..., None]
    return rgb


def sun_disk_radiance(p: SunSkyParams):
    """Radiance of the solar disk, scaled so the disk's total irradiance on a
    sun-facing surface ~= sun_intensity * sun colour."""
    solid_angle = 2.0 * jnp.pi * (1.0 - jnp.cos(p.sun_angular_radius))
    # turbidity-dependent reddening near the horizon (cheap stand-in for the
    # reference's sun-color-vs-turbidity table, sun_and_sky.glsl:141-165)
    elev = jnp.clip(normalize(p.sun_direction)[1], 0.0, 1.0)
    tint = jnp.stack(
        [
            jnp.asarray(1.0, jnp.float32),
            0.6 + 0.4 * elev,
            0.35 + 0.65 * elev,
        ]
    )
    return p.sun_intensity * 25.0 / jnp.maximum(solid_angle, 1e-6) * tint


def sample_sun(p: SunSkyParams, u1, u2):
    """Uniform direction within the sun cone (ref env_sampling.glsl:110-125).

    Returns (dir, pdf_solid_angle, radiance)."""
    sun = normalize(p.sun_direction)
    cos_max = jnp.cos(p.sun_angular_radius)
    cz = 1.0 - u1 * (1.0 - cos_max)
    sz = jnp.sqrt(jnp.maximum(0.0, 1.0 - cz * cz))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack([sz * jnp.cos(phi), sz * jnp.sin(phi), cz], axis=-1)
    from ..ops.math import make_frame, to_world

    t, b = make_frame(jnp.broadcast_to(sun, local.shape))
    d = to_world(t, b, jnp.broadcast_to(sun, local.shape), local)
    pdf = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-9)
    rad = sun_disk_radiance(p)
    return d, jnp.broadcast_to(pdf, u1.shape), jnp.broadcast_to(rad, d.shape)


def sun_pdf(p: SunSkyParams, d):
    """Solid-angle pdf of sample_sun for direction d."""
    sun = normalize(p.sun_direction)
    cos_max = jnp.cos(p.sun_angular_radius)
    inside = dot3(d, sun) > cos_max
    pdf = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-9)
    return jnp.where(inside, pdf, 0.0)
