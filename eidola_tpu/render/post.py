"""Post/tonemap pass (ref shaders/post.frag:29-176, shaders/tonemapping.glsl;
Tonemapper defaults ref render_output.hpp:44-55).

Pipeline: exposure (manual, global Reinhard auto, or LOCAL mip-pyramid
auto) -> filmic tonemap -> contrast/brightness/saturation/vignette -> PCG
dither.  auto_exposure is the reference's bitfield: bit0 = derive the
log-average luminance from the image (post.frag:133-144 top-mip fetch ->
full reduction here), bit1 = the local (Reinhard TMO) variant with a
luminance pyramid as the adaptation estimate (post.frag:70-101).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import rng as erng
from ..ops.math import luminance
from ..ops.tonemap import apply_tonemap
from .config import TonemapParams

_EPSILON = 0.05
_PHI = 2.0
_LEVELS = 7


def avg_luminance(img):
    """Log-average luminance over valid pixels (auto-exposure key)."""
    lum = jnp.maximum(luminance(img), 1e-6)
    return jnp.exp(jnp.mean(jnp.log(lum)))


def _down2(a):
    """2x2 box downsample of a (H, W) plane (odd extents edge-padded)."""
    h, w = a.shape
    if h % 2:
        a = jnp.concatenate([a, a[-1:]], axis=0)
        h += 1
    if w % 2:
        a = jnp.concatenate([a, a[:, -1:]], axis=1)
        w += 1
    return a.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _lum_pyramid(lum, out_h, out_w, levels=_LEVELS + 1):
    """Luminance at `levels` blur scales, each upsampled back to full res
    (the mip fetches of post.frag:77-91)."""
    out = [lum]
    cur = lum
    for _ in range(levels - 1):
        if cur.shape[0] > 1 or cur.shape[1] > 1:
            cur = _down2(cur)
        ry = -(-out_h // cur.shape[0])
        rx = -(-out_w // cur.shape[1])
        up = jnp.repeat(jnp.repeat(cur, ry, axis=0), rx, axis=1)
        out.append(up[:out_h, :out_w])
    return out


def tone_exposure(rgb, log_avg, key, y_white):
    """Global Reinhard-style exposure (ref post.frag:63-68 toneExposure)."""
    y = jnp.maximum(luminance(rgb), 1e-9)
    ys = (key / log_avg) * y
    yd = ys * (1.0 + ys / (y_white * y_white)) / (1.0 + ys)
    return rgb * (yd / y)[..., None]


def tone_local_exposure(rgb, log_avg, key, y_white):
    """Local mip-pyramid exposure (ref post.frag:70-101 toneLocalExposure):
    per pixel, find the largest blur scale whose centre-surround luminance
    difference stays below epsilon; use it as the adaptation luminance."""
    h, w = rgb.shape[:2]
    y = jnp.maximum(luminance(rgb), 1e-9)
    factor = key / log_avg
    ys = factor * y
    pyr = _lum_pyramid(y, h, w)
    la = pyr[_LEVELS] * factor
    done = jnp.zeros((h, w), bool)
    for i in range(_LEVELS):
        v1 = pyr[i] * factor
        v2 = pyr[i + 1] * factor
        scale = float(1 << i)
        stop = (
            jnp.abs(v1 - v2)
            / (key * (2.0 ** _PHI) / (scale * scale) + v1)
            > _EPSILON
        )
        la = jnp.where(stop & ~done, v1, la)
        done = done | stop
    yd = ys / (1.0 + la)
    return rgb * (yd / y)[..., None]


def post_process(img, tm: TonemapParams, frame_word=0, tonemap_kind: int = 0):
    h, w = img.shape[:2]

    # exposure (ref post.frag:133-152): bit0 of auto_exposure = auto key,
    # bit1 = local variant
    auto = (tm.auto_exposure & 1) > 0
    local = (tm.auto_exposure & 2) > 0
    avg = jnp.where(auto, avg_luminance(img), jnp.maximum(tm.avg_lum, 1e-6))
    c_global = tone_exposure(img, avg, tm.key, tm.y_white)
    c_local = tone_local_exposure(img, avg, tm.key, tm.y_white)
    c_auto = jnp.where(local, c_local, c_global)
    c = jnp.where(auto, c_auto, img * tm.exposure)

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
