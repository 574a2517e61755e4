"""Compressed screen-space G-buffer (ref shaders/direct_stage.comp:37-45
packing; decode helpers ref pathtrace.glsl:234-258, denoise_common.glsl:27-55).

Layout is the reference's 16 B/px uvec4 kept as four SoA (H, W) planes:
    depth      f32  hit distance along the primary ray (INF-sentinel on miss)
    nrm        u32  octahedral shading normal
    mat        u32  unorm4x8 (metallic, roughness, ior/4, transmission)
    albedo     u32  24-bit albedo + 8-bit material hash
Positions are reconstructed from pixel-center camera rays * depth, so the
G-buffer carries no xyz (bandwidth feature, ref README.md:85-94).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import octahedral as octa
from ..ops.math import hash8bit, normalize
from ..scene.camera import Camera
from .shade_state import State

MISS_DEPTH = 1e30
MAX_IOR_MINUS_ONE = 3.0  # ior packs as (ior-1)/3 unorm (ref host_device.h:182)


class GBuffer(NamedTuple):
    depth: jnp.ndarray    # (H, W) f32
    nrm: jnp.ndarray      # (H, W) u32
    mat: jnp.ndarray      # (H, W) u32
    albedo: jnp.ndarray   # (H, W) u32
    tri: jnp.ndarray      # (H, W) i32 primary hit triangle id (-1 miss);
    #                       feeds the next frame's primary_seed t_max bound


def empty_gbuffer(h: int, w: int) -> GBuffer:
    return GBuffer(
        depth=jnp.full((h, w), MISS_DEPTH, jnp.float32),
        nrm=jnp.zeros((h, w), jnp.uint32),
        mat=jnp.zeros((h, w), jnp.uint32),
        albedo=jnp.zeros((h, w), jnp.uint32),
        tri=jnp.full((h, w), -1, jnp.int32),
    )


def pack_gbuffer(state: State, t, tri=None) -> GBuffer:
    """State (H, W lanes) + primary hit distance -> packed G-buffer."""
    mat_hash = hash8bit(state.mat_id.astype(jnp.uint32))
    # material word = unorm4x8 (metallic, roughness, (ior-1)/3, transmission)
    # (ref direct_stage.comp:41)
    mat_pack = octa.pack_unorm4x8(
        jnp.stack(
            [
                state.metallic,
                state.roughness,
                (state.ior - 1.0) / MAX_IOR_MINUS_ONE,
                state.transmission,
            ],
            axis=-1,
        )
    )
    return GBuffer(
        depth=jnp.where(state.valid, t, MISS_DEPTH),
        nrm=jnp.where(state.valid, octa.encode_unit_u32(state.nrm), 0),
        mat=jnp.where(state.valid, mat_pack, 0),
        albedo=jnp.where(
            state.valid, octa.pack_albedo_hash(state.albedo, mat_hash), 0
        ),
        tri=(jnp.full(t.shape, -1, jnp.int32) if tri is None
             else jnp.where(state.valid, tri.astype(jnp.int32), -1)),
    )


class GBufferView(NamedTuple):
    """Decoded view used by temporal gates, GI reconstruction and denoise."""
    valid: jnp.ndarray     # (...,) bool
    depth: jnp.ndarray     # (...,) f32
    pos: jnp.ndarray       # (..., 3) world position
    nrm: jnp.ndarray       # (..., 3)
    albedo: jnp.ndarray    # (..., 3)
    mat_hash: jnp.ndarray  # (...,) u32
    metallic: jnp.ndarray  # (...,)
    roughness: jnp.ndarray  # (...,)
    ior: jnp.ndarray       # (...,) decoded from the material word
    transmission: jnp.ndarray  # (...,)


def center_rays(cam: Camera, h: int, w: int):
    """Unjittered pixel-center rays used for position reconstruction
    (ref denoise_common.glsl:27-55)."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
    ndc_x = xs / w * 2.0 - 1.0
    ndc_y = 1.0 - ys / h * 2.0
    ones = jnp.ones((h, w), jnp.float32)
    t4 = jnp.stack([ndc_x * ones, ndc_y * ones, ones, ones], axis=-1)
    cam_dir = t4 @ cam.proj_inv.T
    cam_dir = cam_dir[..., :3] / jnp.where(
        jnp.abs(cam_dir[..., 3:4]) > 1e-20, cam_dir[..., 3:4], 1.0
    )
    world_dir = cam_dir @ cam.view_inv[:3, :3].T
    return normalize(world_dir)


def decode_gbuffer(gbuf: GBuffer, cam_pos, ray_dirs) -> GBufferView:
    """Unpack the G-buffer planes into a shading view.

    cam_pos: (3,) eye of the camera that produced this G-buffer;
    ray_dirs: matching pixel-center directions (H, W, 3)."""
    valid = gbuf.depth < MISS_DEPTH * 0.5
    pos = cam_pos + ray_dirs * gbuf.depth[..., None]
    nrm = octa.decode_unit_u32(gbuf.nrm)
    albedo, mat_hash = octa.unpack_albedo_hash(gbuf.albedo)
    mr = octa.unpack_unorm4x8(gbuf.mat)
    z3 = jnp.zeros_like(pos)
    return GBufferView(
        valid=valid,
        depth=jnp.where(valid, gbuf.depth, MISS_DEPTH),
        pos=jnp.where(valid[..., None], pos, z3),
        nrm=jnp.where(valid[..., None], nrm, z3),
        albedo=jnp.where(valid[..., None], albedo, z3),
        mat_hash=mat_hash,
        metallic=jnp.where(valid, mr[..., 0], 0.0),
        roughness=jnp.where(valid, mr[..., 1], 1.0),
        ior=jnp.where(valid, mr[..., 2] * MAX_IOR_MINUS_ONE + 1.0, 1.5),
        transmission=jnp.where(valid, mr[..., 3], 0.0),
    )
