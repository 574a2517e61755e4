"""Hit record -> shading state
(ref shaders/shade_state.glsl:63-221 GetState + shaders/gltf_material.glsl:
130-176 GetMaterials).

The reference chases instance -> primMesh -> vertex buffers through device
addresses per thread; here a single gather by triangle id pulls the
pre-flattened per-triangle attributes, then barycentric interpolation,
octahedral decode, normal mapping and texture fetches run SoA on the VPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import octahedral as octa
from ..ops.math import dot3, normalize
from ..scene.data import SceneData, rot_apply, shade_row
from ..scene.textures import sample_bilinear
from .bsdf import BsdfParams


class State(NamedTuple):
    """Shading state for one lane (ref globals.glsl State struct)."""
    pos: jnp.ndarray        # (..., 3) world hit position
    nrm: jnp.ndarray        # (..., 3) shading normal (normal-mapped)
    geo_nrm: jnp.ndarray    # (..., 3) geometric normal (faces the incoming ray)
    uv: jnp.ndarray         # (..., 2)
    albedo: jnp.ndarray     # (..., 3) base colour * texture
    opacity: jnp.ndarray    # (...,) base alpha * texture alpha
    metallic: jnp.ndarray   # (...,)
    roughness: jnp.ndarray  # (...,)
    ior: jnp.ndarray        # (...,) index of refraction (ref globals.glsl Material)
    transmission: jnp.ndarray  # (...,) KHR_materials_transmission factor
    emission: jnp.ndarray   # (..., 3)
    mat_id: jnp.ndarray     # (...,) i32
    valid: jnp.ndarray      # (...,) bool — tri >= 0

    def bsdf(self) -> BsdfParams:
        return BsdfParams(
            albedo=self.albedo, metallic=self.metallic, roughness=self.roughness
        )


def _bary_mix(attr3, u, v):
    """attr3: (..., 3, C) per-vertex values; barycentric (1-u-v, u, v)."""
    w = (1.0 - u - v)[..., None]
    return (
        attr3[..., 0, :] * w + attr3[..., 1, :] * u[..., None] + attr3[..., 2, :] * v[..., None]
    )


def get_state(scene: SceneData, o, d, tri, t, u, v, cone_angle=None) -> State:
    """Build shading state for each lane from a closest-hit record.

    o, d: (..., 3) ray; tri: (...,) i32 (-1 = miss); t/u/v hit params.
    cone_angle: scalar ray-cone angle (radians/pixel); when given, texture
    fetches mip-filter with footprint = t * cone_angle * uv_density
    (replaces screen-space derivatives, which a ray tracer lacks; the
    reference's own shading samples lod 0, gltf_material.glsl).
    Lanes with tri < 0 get a zeroed state with valid=False.
    """
    valid = tri >= 0
    tid, inst_id = shade_row(scene, jnp.maximum(tri, 0))
    fp = None
    if cone_angle is not None:
        fp = t * cone_angle * scene.tri_uv_density[tid]
        if inst_id is not None:
            fp = fp * scene.inst.uvd_scale[inst_id]

    pos = o + d * t[..., None]

    nrm_pk = scene.tri_nrm[tid]                       # (..., 3) u32
    n_verts = octa.decode_unit_u32(nrm_pk)            # (..., 3, 3)
    nrm = _bary_mix(n_verts, u, v)

    uv_interp = _bary_mix(scene.tri_uv[tid], u, v)    # (..., 2)

    # geometric normal, oriented against the incoming ray (double-sided
    # shading, ref shade_state.glsl facing flip)
    geo = octa.decode_unit_u32(scene.tri_gn[tid])
    if inst_id is not None:
        # pools store OBJECT-space directions: rotate to world (rotation is
        # linear, so rotating the barycentric mix == mixing rotated verts).
        # det_sign: mirrored instances flip winding, so the GEOMETRIC
        # normal (cross of world edges in the reference / baked path)
        # flips relative to the normal-matrix image of the object gn
        nr = scene.inst.nrm_rot[inst_id]              # (..., 9)
        nrm = rot_apply(nr, nrm)
        geo = normalize(
            rot_apply(nr, geo) * scene.inst.det_sign[inst_id][..., None]
        )
    nrm = normalize(nrm)
    flip = dot3(geo, d) > 0.0
    geo_n = jnp.where(flip[..., None], -geo, geo)
    shade_n = jnp.where(flip[..., None], -nrm, nrm)
    # keep the shading normal in the same hemisphere as the geometric one
    shade_n = jnp.where(
        dot3(shade_n, geo_n)[..., None] < 0.0, geo_n, shade_n
    )

    mat_id = scene.tri_mat[tid]
    m = scene.materials
    base = m.base_color[mat_id]
    base_tex = sample_bilinear(scene.textures, m.base_tex[mat_id], uv_interp,
                               footprint=fp)
    # interpolated vertex COLOR_0 multiplies base colour (glTF 2.0 spec; the
    # reference interpolates it into sstate.color, shade_state.glsl:123-135)
    col_verts = octa.unpack_unorm4x8(scene.tri_color[tid])  # (..., 3, 4)
    vcol = _bary_mix(col_verts, u, v)
    albedo = base[..., :3] * base_tex[..., :3] * vcol[..., :3]
    opacity = base[..., 3] * base_tex[..., 3] * vcol[..., 3]

    mr_tex = sample_bilinear(scene.textures, m.mr_tex[mat_id], uv_interp,
                             footprint=fp)
    # glTF: metallic = B channel, roughness = G channel
    metallic = jnp.clip(m.metallic[mat_id] * mr_tex[..., 2], 0.0, 1.0)
    roughness = jnp.clip(m.roughness[mat_id] * mr_tex[..., 1], 0.02, 1.0)

    em_tex = sample_bilinear(scene.textures, m.emissive_tex[mat_id], uv_interp,
                             footprint=fp)
    emission = m.emissive[mat_id] * em_tex[..., :3]

    # normal mapping via per-vertex tangent frame (ref gltf_material.glsl:134-146)
    has_nm = m.normal_tex[mat_id] >= 0
    tan_verts = octa.decode_unit_u32(scene.tri_tangent[tid])
    tangent = _bary_mix(tan_verts, u, v)
    hand = _bary_mix(scene.tri_hand[tid][..., None], u, v)[..., 0]
    if inst_id is not None:
        # world-space cross(n_w, t_w) below already carries a mirrored
        # instance's det sign — same TBN semantics as the reference's
        # shader and as the flattened (baked) path (PARITY r3 gap #3)
        tangent = rot_apply(scene.inst.rot[inst_id], tangent)
    tangent = normalize(tangent)
    # orthogonalize against the shading normal
    tangent = normalize(tangent - shade_n * dot3(tangent, shade_n)[..., None])
    bitan = jnp.cross(shade_n, tangent) * jnp.sign(hand)[..., None]
    nm = sample_bilinear(scene.textures, m.normal_tex[mat_id], uv_interp,
                         footprint=fp)
    nm_vec = nm[..., :3] * 2.0 - 1.0
    mapped = normalize(
        tangent * nm_vec[..., 0:1] + bitan * nm_vec[..., 1:2] + shade_n * nm_vec[..., 2:3]
    )
    shade_n = jnp.where(has_nm[..., None], mapped, shade_n)

    def z(x):
        return jnp.where(
            valid.reshape(valid.shape + (1,) * (x.ndim - valid.ndim)), x, 0.0
        )

    return State(
        pos=z(pos),
        nrm=z(shade_n),
        geo_nrm=z(geo_n),
        uv=z(uv_interp),
        albedo=z(albedo),
        opacity=jnp.where(valid, opacity, 0.0),
        metallic=jnp.where(valid, metallic, 0.0),
        roughness=jnp.where(valid, roughness, 1.0),
        ior=jnp.where(valid, m.ior[mat_id], 1.5),
        transmission=jnp.where(valid, m.transmission[mat_id], 0.0),
        emission=z(emission),
        mat_id=jnp.where(valid, mat_id, -1),
        valid=valid,
    )
