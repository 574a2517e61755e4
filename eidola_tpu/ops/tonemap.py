"""Tonemapping operators + sRGB converters (ref shaders/tonemapping.glsl:24-105)."""
from __future__ import annotations

import jax.numpy as jnp

TONEMAP_UNCHARTED2 = 0
TONEMAP_HEJL_RICHARD = 1
TONEMAP_ACES = 2


def srgb_to_linear(c):
    """sRGB EOTF (ref tonemapping.glsl sRGB helpers)."""
    return jnp.where(
        c <= 0.04045, c / 12.92, jnp.power((jnp.maximum(c, 0.04045) + 0.055) / 1.055, 2.4)
    )


def linear_to_srgb(c):
    c = jnp.maximum(c, 0.0)
    return jnp.where(
        c <= 0.0031308,
        c * 12.92,
        1.055 * jnp.power(jnp.maximum(c, 0.0031308), 1.0 / 2.4) - 0.055,
    )


def _uncharted2_curve(x):
    # Hable filmic operator constants (public Uncharted2 curve).
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def tonemap_uncharted2(color):
    """Uncharted2 filmic tonemap, the reference default
    (ref tonemapping.glsl:48-65; selected at post.frag:29)."""
    exposure_bias = 2.0
    W = 11.2
    curr = _uncharted2_curve(exposure_bias * color)
    white_scale = 1.0 / _uncharted2_curve(jnp.asarray(W))
    return linear_to_srgb(jnp.clip(curr * white_scale, 0.0, 1.0))


def tonemap_hejl_richard(color):
    """Hejl-Richard filmic (includes sRGB; ref tonemapping.glsl)."""
    c = jnp.maximum(0.0, color - 0.004)
    return (c * (6.2 * c + 0.5)) / (c * (6.2 * c + 1.7) + 0.06)


def tonemap_aces(color):
    """Narkowicz ACES fit (ref tonemapping.glsl)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = jnp.maximum(color, 0.0)
    tone = jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)
    return linear_to_srgb(tone)


def apply_tonemap(color, kind: int = TONEMAP_UNCHARTED2):
    if kind == TONEMAP_UNCHARTED2:
        return tonemap_uncharted2(color)
    if kind == TONEMAP_HEJL_RICHARD:
        return tonemap_hejl_richard(color)
    if kind == TONEMAP_ACES:
        return tonemap_aces(color)
    raise ValueError(f"unknown tonemap kind {kind}")
