"""Metallic-roughness BSDF with VNDF GGX sampling
(ref shaders/pbr_metallicworkflow.glsl:22-173).

All functions work in LOCAL shading space (n = +z) on SoA lanes; callers
build the tangent frame and convert.  Convention: eval returns the BRDF value
f (without the cosine); pdf is solid-angle.

Model (matching the reference's behaviour):
- Fresnel-Schlick with f0 = mix(0.08, albedo, metallic)
- GTR2/GGX NDF, Smith-Schlick G2
- f = mix(diffuse, specular, F): the diffuse lobe is scaled by (1 - F)
  per channel (ref pbr_metallicworkflow.glsl:105,143)
- alpha = roughness DIRECTLY — the reference comments out the perceptual
  alpha = roughness^2 convention (ref pbr_metallicworkflow.glsl:90-91)
- lambert diffuse scaled by (1 - metallic)
- lobe selection probability: spec = 1 / (2 - metallic)
- specular direction via Heitz VNDF sampling, diffuse via cosine hemisphere
  (the pdf matches OUR sampler, so the estimator is self-consistent; the
  reference pairs its sampler with a plain-NDF pdf)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.math import cosine_sample_hemisphere, dot3, normalize


class BsdfParams(NamedTuple):
    albedo: jnp.ndarray     # (..., 3) linear base colour
    metallic: jnp.ndarray   # (...,)
    roughness: jnp.ndarray  # (...,)


def _alpha(p: BsdfParams):
    """GGX alpha = roughness directly (the reference disables the
    perceptual-roughness squaring, ref pbr_metallicworkflow.glsl:90-91)."""
    return jnp.maximum(p.roughness, 1e-4)


def _f0(p: BsdfParams):
    m = p.metallic[..., None]
    return 0.08 * (1.0 - m) + p.albedo * m


def _fresnel_schlick(f0, cos_h):
    c = jnp.clip(1.0 - cos_h, 0.0, 1.0)
    return f0 + (1.0 - f0) * (c ** 5)[..., None]


def _ggx_d(alpha, cos_nh):
    a2 = alpha * alpha
    d = cos_nh * cos_nh * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-12)


def _smith_g1(alpha, cos_nv):
    # Schlick-GGX with k = alpha/2 (ref pbr_metallicworkflow.glsl:43-50)
    k = alpha * 0.5
    return cos_nv / jnp.maximum(cos_nv * (1.0 - k) + k, 1e-9)


def _spec_prob(p: BsdfParams):
    """Specular lobe probability 1/(2-metallic)
    (ref pbr_metallicworkflow.glsl:86-173)."""
    return 1.0 / (2.0 - p.metallic)


def eval_bsdf(p: BsdfParams, wo, wi):
    """BRDF value f(wo, wi) in local space; zero below the horizon."""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    valid = (cos_o > 1e-6) & (cos_i > 1e-6)
    h = normalize(wo + wi)
    cos_nh = jnp.clip(h[..., 2], 0.0, 1.0)
    cos_oh = jnp.clip(dot3(wo, h), 0.0, 1.0)

    alpha = _alpha(p)
    D = _ggx_d(alpha, cos_nh)
    G = _smith_g1(alpha, jnp.maximum(cos_o, 1e-6)) * _smith_g1(
        alpha, jnp.maximum(cos_i, 1e-6)
    )
    F = _fresnel_schlick(_f0(p), cos_oh)
    spec = (D * G / jnp.maximum(4.0 * cos_o * cos_i, 1e-9))[..., None]
    diff = p.albedo * ((1.0 - p.metallic) / jnp.pi)[..., None]
    # mix(diffuse, specular, F): per-channel Fresnel blend
    # (ref pbr_metallicworkflow.glsl:105,143)
    f = diff * (1.0 - F) + spec * F
    return jnp.where(valid[..., None], f, 0.0)


def pdf_bsdf(p: BsdfParams, wo, wi):
    """Solid-angle pdf of sample_bsdf."""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    valid = (cos_o > 1e-6) & (cos_i > 1e-6)
    h = normalize(wo + wi)
    cos_nh = jnp.clip(h[..., 2], 0.0, 1.0)
    cos_oh = jnp.maximum(dot3(wo, h), 1e-6)

    alpha = _alpha(p)
    D = _ggx_d(alpha, cos_nh)
    g1 = _smith_g1(alpha, jnp.maximum(cos_o, 1e-6))
    # VNDF pdf: D_vis(h) / (4 (wo.h)) with D_vis = G1 D (wo.h) / cos_o
    pdf_spec = D * g1 / jnp.maximum(4.0 * cos_o, 1e-9)
    pdf_diff = jnp.maximum(cos_i, 0.0) / jnp.pi
    ps = _spec_prob(p)
    pdf = ps * pdf_spec + (1.0 - ps) * pdf_diff
    return jnp.where(valid, pdf, 0.0)


def _sample_vndf(alpha, wo, u1, u2):
    """Heitz 2018 visible-NDF sampling of GGX (ref
    pbr_metallicworkflow.glsl:67-84).  Returns the half vector in local space."""
    vx = alpha * wo[..., 0]
    vy = alpha * wo[..., 1]
    vz = wo[..., 2]
    vh = normalize(jnp.stack([vx, vy, vz], axis=-1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where(
        (lensq > 1e-10)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], -1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = t1 * p1[..., None] + t2 * p2[..., None] + vh * p3[..., None]
    h = jnp.stack(
        [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)],
        axis=-1,
    )
    return normalize(h)


def sample_bsdf(p: BsdfParams, wo, u1, u2, u3):
    """Sample an incident direction.  Returns (wi, pdf, f).

    u3 selects the lobe (spec with prob 1/(2-metallic)); u1/u2 drive the
    chosen sampler.  Both lobes are evaluated with the mixture pdf so MIS
    stays consistent (ref pbr_metallicworkflow.glsl:146-173)."""
    alpha = _alpha(p)
    ps = _spec_prob(p)
    pick_spec = u3 < ps

    h = _sample_vndf(alpha, wo, u1, u2)
    wi_spec = 2.0 * dot3(wo, h)[..., None] * h - wo
    wi_diff = cosine_sample_hemisphere(u1, u2)
    wi = jnp.where(pick_spec[..., None], wi_spec, wi_diff)
    wi = normalize(wi)
    pdf = pdf_bsdf(p, wo, wi)
    f = eval_bsdf(p, wo, wi)
    return wi, pdf, f
