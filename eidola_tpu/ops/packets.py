"""Packet-coherent ray ordering for image-shaped ray fields.

The BVH walker (ops/bvh.py) gives every 128 consecutive rays one shared
traversal cursor, so consecutive rays should be spatially coherent.  For
image rays, an 8x16 pixel tile (= exactly one 128-lane packet) has a far
tighter frustum than a 128-pixel scanline run.  These helpers reorder
(H, W, ...) rasters into tile-major order and back using pure
reshape/transpose (static relayouts — no gathers).

This is the TPU analog of the reference's 8x8 workgroup rasterization
(ref host_device.h:31-38) and its SWIZZLED workgroup layout experiment
(ref direct_gen.comp:35-50).
"""
from __future__ import annotations

import jax.numpy as jnp

from .bvh import BVH, HitRecord, any_hit, closest_hit

TILE_H = 8
TILE_W = 16


def _tileable(h: int, w: int) -> bool:
    return h % TILE_H == 0 and w % TILE_W == 0


def to_tiles(a, h: int, w: int):
    """(h, w, ...) -> (h*w, ...) in tile-major order."""
    if not _tileable(h, w):
        return a.reshape((h * w,) + a.shape[2:])
    th, tw = TILE_H, TILE_W
    x = a.reshape((h // th, th, w // tw, tw) + a.shape[2:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h * w,) + a.shape[2:])


def from_tiles(a, h: int, w: int):
    """Inverse of to_tiles: (h*w, ...) tile-major -> (h, w, ...)."""
    if not _tileable(h, w):
        return a.reshape((h, w) + a.shape[1:])
    th, tw = TILE_H, TILE_W
    x = a.reshape((h // th, w // tw, th, tw) + a.shape[1:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h, w) + a.shape[1:])


def closest_hit_img(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Closest hit for (H, W, 3) ray fields with tile-packet ordering.
    Returns a HitRecord of (H, W) arrays."""
    h, w = o.shape[:2]
    rec = closest_hit(
        bvh,
        to_tiles(o, h, w),
        to_tiles(d, h, w),
        to_tiles(t_min, h, w),
        to_tiles(t_max, h, w),
        max_steps=max_steps,
    )
    return HitRecord(
        tri=from_tiles(rec.tri, h, w),
        t=from_tiles(rec.t, h, w),
        u=from_tiles(rec.u, h, w),
        v=from_tiles(rec.v, h, w),
    )


def any_hit_img(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Occlusion query for (H, W, 3) ray fields with tile-packet ordering."""
    h, w = o.shape[:2]
    occ = any_hit(
        bvh,
        to_tiles(o, h, w),
        to_tiles(d, h, w),
        to_tiles(t_min, h, w),
        to_tiles(t_max, h, w),
        max_steps=max_steps,
    )
    return from_tiles(occ, h, w)
