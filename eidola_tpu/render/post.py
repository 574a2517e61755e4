"""Post/tonemap pass (ref shaders/post.frag:29-176, shaders/tonemapping.glsl;
Tonemapper defaults ref render_output.hpp:44-55).

Pipeline: exposure (manual or auto from average luminance) -> Uncharted2
filmic -> contrast/brightness/saturation/vignette -> PCG dither.
Auto-exposure derives the average log-luminance by a full reduction —
the TPU-native stand-in for the reference's mip-pyramid trick
(render_output.cpp:243-254 genMipmap; post.frag:133-152).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import rng as erng
from ..ops.math import luminance
from ..ops.tonemap import apply_tonemap
from .config import TonemapParams


def avg_luminance(img):
    """Log-average luminance over valid pixels (auto-exposure key)."""
    lum = jnp.maximum(luminance(img), 1e-6)
    return jnp.exp(jnp.mean(jnp.log(lum)))


def post_process(img, tm: TonemapParams, frame_word=0, tonemap_kind: int = 0):
    h, w = img.shape[:2]

    # exposure
    auto = tm.auto_exposure > 0
    avg = avg_luminance(img)
    exposure = jnp.where(auto, 0.18 / jnp.maximum(avg, 1e-6), tm.exposure)
    c = img * exposure

    # filmic tonemap -> sRGB-ish [0,1]
    c = apply_tonemap(c, tonemap_kind)

    # colour grade (ref post.frag:162-171)
    c = (c - 0.5) * tm.contrast + 0.5 + (tm.brightness - 1.0)
    lum = luminance(c)[..., None]
    c = lum + (c - lum) * tm.saturation

    # vignette
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 0.5
    r2 = (ys * ys)[:, None] + (xs * xs)[None, :]
    c = c * (1.0 - tm.vignette * jnp.clip(r2 * 2.0, 0.0, 1.0))[..., None]

    # PCG dither to break 8-bit banding (ref post.frag:158-160)
    seed = erng.seed_pixels(h, w, jnp.asarray(frame_word, jnp.uint32) ^ jnp.uint32(0xD17))
    _, n = erng.rand(seed)
    c = c + (n[..., None] - 0.5) * (tm.dither.astype(jnp.float32) / 255.0)

    return jnp.clip(c, 0.0, 1.0)
