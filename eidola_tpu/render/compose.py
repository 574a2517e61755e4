"""Compose: re-modulate albedo and merge direct + upsampled indirect
(ref shaders/compose.comp:23-42).

out = direct_illum * albedo + emission + upsample(indirect_illum) * albedo
Inputs are LDR-compressed from the denoiser and re-expanded here
(the reference re-expands inside the last denoise iteration; algebraically
identical since compose is pointwise).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.math import ldr_to_hdr
from .gbuffer import GBufferView


def upsample2x(img_half, out_h: int, out_w: int):
    """Nearest upsample of the half-res indirect field (ref compose.comp:30-38
    reads indirect at coord/2)."""
    up = jnp.repeat(jnp.repeat(img_half, 2, axis=0), 2, axis=1)
    return up[:out_h, :out_w]


def compose(
    direct_ldr,
    indirect_ldr_half,
    emission,
    view: GBufferView,
    modulate: bool = True,
):
    h, w = direct_ldr.shape[:2]
    direct = ldr_to_hdr(direct_ldr)
    if indirect_ldr_half is not None:
        # only upsample when the indirect field really is half-res
        # (cfg.indirect_half_res=False hands us a full-res buffer)
        if indirect_ldr_half.shape[:2] != (h, w):
            indirect = ldr_to_hdr(upsample2x(indirect_ldr_half, h, w))
        else:
            indirect = ldr_to_hdr(indirect_ldr_half)
    else:
        indirect = jnp.zeros_like(direct)
    if modulate:
        albedo = view.albedo
        out = (direct + indirect) * albedo + emission
    else:
        # debug path: raw indirect field (ref compose.comp modulate==0)
        out = indirect
    return out
