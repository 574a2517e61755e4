"""Procedural sun & sky — full reference model
(ref shaders/sun_and_sky.glsl:141-601; defaults sample_example.hpp:186-203).

Structure mirrors the reference's `sun_and_sky()` composition:
  Perez/Preetham sky dome (calc_env_color)            [:253-267]
  atmospheric sun transmittance colour (calc_sun_color) [:141-165]
  physically-shaped sun disk + glow                    [:522-545]
  ground plane lit by hemisphere irradiance (calc_irrad) [:270-290, 548-579]
  night brightness rolloff + night colour floor        [:440-450, 583-597]
  saturation / red-blue-shift colour tweaks            [:292-355, 581]
All vectorized jnp over direction arrays; the Preetham polynomials are the
published constants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import dot3, luminance, normalize
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
_RADIANCE_SCALE = 0.035  # kcd/m^2 -> scene radiance units (matches r1 tuning)


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


def calc_sun_color(sun_elev, turbidity):
    """Atmospheric transmittance colour of direct sunlight — aerosol +
    ozone + Rayleigh attenuation vs optical air mass
    (ref sun_and_sky.glsl:141-165 calc_sun_color), normalized so a
    zenith sun is ~white."""
    z = jnp.maximum(sun_elev, 1e-4)
    wavelength = jnp.asarray([0.610, 0.550, 0.470], jnp.float32)
    ko = jnp.asarray([12.0, 8.5, 0.9], jnp.float32)
    sol = jnp.asarray([1.0, 0.992, 0.911], jnp.float32)
    ang_deg = jnp.degrees(jnp.arccos(jnp.clip(z, 0.0, 1.0)))
    m = 1.0 / (z + 0.15 * jnp.power(jnp.maximum(93.885 - ang_deg, 1.0), -1.253))
    beta = 0.04608 * turbidity - 0.04586
    ta = jnp.exp(-m * beta * jnp.power(wavelength, -1.3))
    to = jnp.exp(-m * ko * 0.0035)
    tr = jnp.exp(-m * 0.008735 * jnp.power(wavelength, -4.08))
    c = ta * to * tr * sol
    return jnp.where(sun_elev > 0.0, c, jnp.zeros_like(c))


def _night_factor(sun_elev):
    """Brightness rolloff as the sun sets (ref sun_and_sky.glsl:440-450
    night_brightness_adjustment): 1 above horizon, quartic falloff to zero
    at elevation -0.309 (sin 18 deg, astronomical twilight-ish)."""
    lmt = 0.30901699
    f = jnp.clip((sun_elev + lmt) / lmt, 0.0, 1.0)
    f2 = f * f
    return jnp.where(sun_elev >= 0.0, 1.0, f2 * f2)


def _env_color(p: SunSkyParams, d, sun, T):
    """Perez sky colour for directions d (ref calc_env_color)."""
    cos_theta = jnp.clip(d[..., 1], -1.0, 1.0)
    cos_gamma = jnp.clip(dot3(d, sun), -1.0, 1.0)
    gamma = jnp.arccos(cos_gamma)
    theta_s = jnp.arccos(jnp.clip(sun[1], -1.0, 1.0))

    AY, BY = 0.1787 * T - 1.4630, -0.3554 * T + 0.4275
    CY, DY, EY = -0.0227 * T + 5.3251, 0.1206 * T - 2.5771, -0.0670 * T + 0.3703
    Ax, Bx = -0.0193 * T - 0.2592, -0.0665 * T + 0.0008
    Cx, Dx, Ex = -0.0004 * T + 0.2125, -0.0641 * T - 0.8989, -0.0033 * T + 0.0452
    Ay, By = -0.0167 * T - 0.2608, -0.0950 * T + 0.0092
    Cy, Dy, Ey = -0.0079 * T + 0.2102, -0.0441 * T - 1.6537, -0.0109 * T + 0.0529

    chi = (4.0 / 9.0 - T / 120.0) * (jnp.pi - 2.0 * theta_s)
    Yz = jnp.maximum(
        (4.0453 * T - 4.9710) * jnp.tan(chi) - 0.2155 * T + 2.4192, 0.0
    )
    xz, yz = _zenith_chromaticity(T, theta_s)

    cos_ts = jnp.cos(theta_s)
    denomY = _perez(jnp.asarray(1.0), theta_s, cos_ts, AY, BY, CY, DY, EY)
    denomx = _perez(jnp.asarray(1.0), theta_s, cos_ts, Ax, Bx, Cx, Dx, Ex)
    denomy = _perez(jnp.asarray(1.0), theta_s, cos_ts, Ay, By, Cy, Dy, Ey)

    ct = jnp.maximum(cos_theta, 0.01)
    Y = Yz * _perez(ct, gamma, cos_gamma, AY, BY, CY, DY, EY) / denomY
    x = xz * _perez(ct, gamma, cos_gamma, Ax, Bx, Cx, Dx, Ex) / denomx
    y = yz * _perez(ct, gamma, cos_gamma, Ay, By, Cy, Dy, Ey) / denomy

    y = jnp.maximum(y, 1e-4)
    X = x / y * Y
    Z = (1.0 - x - y) / y * Y
    xyz = jnp.stack([X, Y, Z], axis=-1)
    return jnp.maximum(xyz @ _XYZ2RGB.T, 0.0)


def _irradiance(p: SunSkyParams, sun, T):
    """Cosine-hemisphere sky irradiance for the ground plane — the 25-point
    quadrature of calc_irrad (ref sun_and_sky.glsl:270-290).  Called ONCE at
    scene finalize (finalize_sunsky), never in the per-ray graph."""
    us = (np.arange(5) + 0.5) / 5.0
    dirs = []
    for u in us:
        for v in us:
            st = np.sqrt(u)
            phi = 2.0 * np.pi * v
            # cosine-weighted upper-hemisphere direction (y up)
            dirs.append([
                st * np.cos(phi), np.sqrt(max(1.0 - u, 0.0)), st * np.sin(phi)
            ])
    dd = jnp.asarray(np.asarray(dirs, np.float32))
    return jnp.mean(_env_color(p, dd, sun, T), axis=0)


def finalize_sunsky(p: SunSkyParams) -> SunSkyParams:
    """Precompute the param-only derived quantities (ground irradiance) so
    the per-ray sky evaluation stays small in the traced graph.  Called by
    upload_scene; call again after _replace-ing sky fields.

    The 75-float quadrature runs as ONE jitted program ON THE HOST CPU
    backend: dispatched eagerly on a tunneled TPU it is dozens of tiny
    ops, each a separate remote compile + round trip (measured ~23-60 s
    of a TPU-side scene build; milliseconds on local CPU)."""

    def _quad(p):
        T = jnp.maximum(jnp.asarray(p.turbidity, jnp.float32), 2.0)
        sun = normalize(jnp.asarray(p.sun_direction, jnp.float32))
        sun_c = normalize(
            jnp.stack([sun[0], jnp.maximum(sun[1], 0.001), sun[2]])
        )
        return _irradiance(p, sun_c, T)

    try:
        cpu = jax.devices("cpu")[0]
        host_p = jax.tree.map(np.asarray, p)
        irr = np.asarray(jax.jit(_quad, device=cpu)(host_p), np.float32)
    except RuntimeError:  # no cpu backend registered: run where we are
        irr = np.asarray(jax.jit(_quad)(p), np.float32)
    return p._replace(ground_irradiance=irr)


def _colortweak(rgb, saturation, redness):
    """Saturation + red/blue shift (ref sun_and_sky.glsl:327-355
    arch_colortweak)."""
    inten = luminance(rgb)[..., None]
    sat = jnp.maximum(saturation, 0.0)
    out = rgb * sat + inten * (1.0 - sat)
    out = jnp.maximum(out, 0.0)
    # redness > 0 warms, < 0 cools (ref redblueshift in [-1, 1])
    shift = jnp.stack(
        [1.0 + redness, jnp.ones_like(redness), 1.0 - redness]
    )
    return out * shift


def sky_radiance(p: SunSkyParams, d):
    """Sky dome radiance for unit directions d (..., 3), linear RGB —
    the full sun_and_sky composition (ref sun_and_sky.glsl:453-601)."""
    T = jnp.maximum(p.turbidity, 2.0)
    sun = normalize(p.sun_direction)
    night = _night_factor(sun[1])
    # clamp both to just above the horizon for the sky model itself
    sun_c = normalize(
        jnp.stack([sun[0], jnp.maximum(sun[1], 0.001), sun[2]])
    )
    cos_gamma = jnp.clip(dot3(d, sun), -1.0, 1.0)
    gamma = jnp.arccos(cos_gamma)
    downness = d[..., 1]
    d_c = jnp.stack(
        [d[..., 0], jnp.maximum(d[..., 1], 0.001), d[..., 2]], axis=-1
    )
    d_c = normalize(d_c)

    tint = _env_color(p, d_c, sun_c, T) * night

    # sun disk + glow with the transmittance colour (ref :522-545).  The
    # bright core is EXACTLY the sample_sun cone (p.sun_angular_radius) so
    # NEE and BSDF-sampled estimators see the same disk energy; the core
    # radiance is set so the disk's irradiance on a sun-facing surface is
    # ~25 x sun_intensity (physically-scaled-sun analog) regardless of the
    # cone size.  The faint glow outside carries ~0.1% of the energy.
    sun_color = calc_sun_color(sun[1], T)
    solid_angle = 2.0 * jnp.pi * (1.0 - jnp.cos(p.sun_angular_radius))
    core_w = 25.0 / jnp.maximum(solid_angle * _RADIANCE_SCALE, 1e-12)
    glow_radius = p.sun_angular_radius * 50.0
    in_core = (gamma < p.sun_angular_radius).astype(jnp.float32)
    glow = (
        jnp.clip(1.0 - gamma / glow_radius, 0.0, 1.0) ** 3
        * 50.0 * p.sun_glow_intensity
    )
    disk_w = in_core * core_w + glow * (1.0 - in_core)
    tint = tint + sun_color * (disk_w * night)[..., None]

    # ground plane lit by sky irradiance + direct sun (ref :548-579);
    # irradiance precomputed at finalize_sunsky (param-only)
    irrad = p.ground_irradiance
    downcolor = p.ground_color * (
        irrad + sun_color * jnp.maximum(sun[1], 0.0)
    ) * night
    hor_blur = 0.05
    dness = jnp.clip(-downness / hor_blur, 0.0, 1.0)
    dness = dness * dness * (3.0 - 2.0 * dness)
    rgb = tint * (1.0 - dness[..., None]) + downcolor * dness[..., None]
    night_w = 1.0 - dness

    rgb = _colortweak(rgb, p.saturation, p.redblueshift)
    rgb = rgb * (_RADIANCE_SCALE * p.sun_intensity) * p.sky_tint
    # night colour floor applies to the FINAL radiance (the reference's
    # night_color is not run through rgb_scale, ref :583-597)
    return jnp.maximum(rgb, p.night_color * night_w[..., None])


def sun_disk_radiance(p: SunSkyParams):
    """Radiance of the solar disk core (what sample_sun's cone sees):
    transmittance-coloured; disk irradiance on a sun-facing surface is
    ~25 x sun_intensity (matches the core term of sky_radiance exactly)."""
    sun = normalize(p.sun_direction)
    night = _night_factor(sun[1])
    sun_color = calc_sun_color(sun[1], jnp.maximum(p.turbidity, 2.0))
    solid_angle = 2.0 * jnp.pi * (1.0 - jnp.cos(p.sun_angular_radius))
    rad = sun_color * (25.0 / jnp.maximum(solid_angle, 1e-12)) * night
    rad = _colortweak(rad, p.saturation, p.redblueshift)
    return rad * p.sun_intensity * p.sky_tint


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
