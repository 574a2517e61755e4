"""Edge-avoiding a-trous wavelet denoiser
(ref shaders/denoise_direct.comp:19-71, denoise_indirect.comp,
denoise_common.glsl:15-55).

Each level applies a 5x5 B3-spline kernel with taps at stride 2^level.
Edge-stopping weights:
    exp(-|lum_p - lum_q| / sigma_lum)
  * exp(-||n_p - n_q||^2 / sigma_norm)
  * exp(-||x_p - x_q||^2 / (sigma_depth * 2^level))
  * hard material-hash gate
The input is HDR->LDR range-compressed (done by the producing stage) and the
caller re-expands after the last level (ref denoise_direct.comp:152-173).

TPU shape: taps are STATIC shifted slices of an edge-padded tensor — no
gathers; XLA fuses the 25 taps per level into vector code.  The reference's
compile-time single-pass bilateral alternative (host_device.h:28) is
`bilateral_denoise`.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.math import luminance
from .gbuffer import GBufferView

_K5 = [1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0]


def _shift(a, dy: int, dx: int, pad: int):
    """Static shifted view of an edge-padded array: a is (H+2p, W+2p, ...)."""
    h = a.shape[0] - 2 * pad
    w = a.shape[1] - 2 * pad
    return a[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def _pad(a, pad: int):
    cfgs = [(pad, pad), (pad, pad)] + [(0, 0)] * (a.ndim - 2)
    return jnp.pad(a, cfgs, mode="edge")


def atrous_level(
    img,
    view: GBufferView,
    level: int,
    sigma_lum,
    sigma_norm,
    sigma_depth,
):
    """One a-trous iteration at stride 2^level (ref denoise_direct.comp:19-71)."""
    stride = 1 << level
    pad = 2 * stride

    img_p = _pad(img, pad)
    pos_p = _pad(view.pos, pad)
    nrm_p = _pad(view.nrm, pad)
    hash_p = _pad(view.mat_hash, pad)
    valid_p = _pad(view.valid, pad)

    lum_c = luminance(img)
    inv_sl = 1.0 / jnp.maximum(sigma_lum, 1e-4)
    inv_sn = 1.0 / jnp.maximum(sigma_norm, 1e-4)
    inv_sd = 1.0 / jnp.maximum(sigma_depth * stride, 1e-4)

    acc = jnp.zeros_like(img)
    wsum = jnp.zeros_like(lum_c)
    for iy, ky in enumerate(_K5):
        for ix, kx in enumerate(_K5):
            dy = (iy - 2) * stride
            dx = (ix - 2) * stride
            q_img = _shift(img_p, dy, dx, pad)
            q_pos = _shift(pos_p, dy, dx, pad)
            q_nrm = _shift(nrm_p, dy, dx, pad)
            q_hash = _shift(hash_p, dy, dx, pad)
            q_valid = _shift(valid_p, dy, dx, pad)

            w_l = jnp.exp(-jnp.abs(luminance(q_img) - lum_c) * inv_sl)
            dn = view.nrm - q_nrm
            w_n = jnp.exp(-jnp.sum(dn * dn, axis=-1) * inv_sn)
            dx_ = view.pos - q_pos
            w_x = jnp.exp(-jnp.sum(dx_ * dx_, axis=-1) * inv_sd)
            gate = (q_hash == view.mat_hash) & q_valid & view.valid

            w = (ky * kx) * w_l * w_n * w_x * gate.astype(jnp.float32)
            acc = acc + q_img * w[..., None]
            wsum = wsum + w

    out = acc / jnp.maximum(wsum, 1e-8)[..., None]
    return jnp.where(view.valid[..., None], out, img)


def atrous_denoise(img, view: GBufferView, levels: int, sigma_lum, sigma_norm,
                   sigma_depth):
    """Full wavelet chain, level 0..levels-1 (ref renderer.cpp:178-202:
    4 direct / 5 indirect iterations with denoiseLevel push constant)."""
    for level in range(levels):
        img = atrous_level(img, view, level, sigma_lum, sigma_norm, sigma_depth)
    return img


def bilateral_denoise(img, view: GBufferView, radius: int, sigma_lum,
                      sigma_norm, sigma_depth):
    """Single-pass bilateral alternative (ref denoise_direct.comp:73-137,
    compile-time DENOISER_DIRECT_BILATERAL)."""
    pad = radius
    img_p = _pad(img, pad)
    pos_p = _pad(view.pos, pad)
    nrm_p = _pad(view.nrm, pad)
    hash_p = _pad(view.mat_hash, pad)
    valid_p = _pad(view.valid, pad)
    lum_c = luminance(img)

    inv_sl = 1.0 / jnp.maximum(sigma_lum, 1e-4)
    inv_sn = 1.0 / jnp.maximum(sigma_norm, 1e-4)
    inv_sd = 1.0 / jnp.maximum(sigma_depth, 1e-4)
    sigma_px = max(radius / 2.0, 1.0)

    acc = jnp.zeros_like(img)
    wsum = jnp.zeros_like(lum_c)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma_px * sigma_px))
            q_img = _shift(img_p, dy, dx, pad)
            q_pos = _shift(pos_p, dy, dx, pad)
            q_nrm = _shift(nrm_p, dy, dx, pad)
            q_hash = _shift(hash_p, dy, dx, pad)
            q_valid = _shift(valid_p, dy, dx, pad)
            w_l = jnp.exp(-jnp.abs(luminance(q_img) - lum_c) * inv_sl)
            dn = view.nrm - q_nrm
            w_n = jnp.exp(-jnp.sum(dn * dn, axis=-1) * inv_sn)
            dxp = view.pos - q_pos
            w_x = jnp.exp(-jnp.sum(dxp * dxp, axis=-1) * inv_sd)
            gate = (q_hash == view.mat_hash) & q_valid & view.valid
            w = g * w_l * w_n * w_x * gate.astype(jnp.float32)
            acc = acc + q_img * w[..., None]
            wsum = wsum + w
    out = acc / jnp.maximum(wsum, 1e-8)[..., None]
    return jnp.where(view.valid[..., None], out, img)
