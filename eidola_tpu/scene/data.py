"""Device-side scene representation + host->device upload.

TPU-native equivalent of Scene's GPU buffers (ref src/scene.cpp:179-289:
vertex/index SSBOs, material SSBO, instance SSBO, light SSBOs).  Instead of
per-mesh buffers addressed through buffer_device_address, everything is
flattened at load into world-space per-triangle SoA arrays — one gather by
triangle id replaces the reference's instance->primMesh->vertex indirection
chain (shade_state.glsl:63-221).  Per-vertex normals/tangents keep the
reference's octahedral u32 compression (scene.cpp:236-257) because shading
decodes them on the VPU for free and it quarters the gather bandwidth.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import octahedral as octa
from ..ops.alias_table import AliasTable, make_alias_table
from ..ops.bvh import BVH, build_bvh

ALPHA_OPAQUE = 0
ALPHA_MASK = 1
ALPHA_BLEND = 2

LIGHT_POINT = 0
LIGHT_DIRECTIONAL = 1
LIGHT_SPOT = 2


class Materials(NamedTuple):
    """SoA material table (ref GltfShadeMaterial, host_device.h:183-204)."""
    base_color: jnp.ndarray      # (M, 4) f32 factor (rgba)
    emissive: jnp.ndarray        # (M, 3) f32
    metallic: jnp.ndarray        # (M,) f32
    roughness: jnp.ndarray       # (M,) f32
    ior: jnp.ndarray             # (M,) f32
    transmission: jnp.ndarray    # (M,) f32
    base_tex: jnp.ndarray        # (M,) i32 texture id or -1
    mr_tex: jnp.ndarray          # (M,) i32
    normal_tex: jnp.ndarray      # (M,) i32
    emissive_tex: jnp.ndarray    # (M,) i32
    alpha_mode: jnp.ndarray      # (M,) i32
    alpha_cutoff: jnp.ndarray    # (M,) f32
    double_sided: jnp.ndarray    # (M,) i32


WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2


class TexStack(NamedTuple):
    """Padded texture array stack with an in-plane mip atlas: uniform-shape
    gather target (replaces per-texture Vulkan combined image samplers with
    their wrap modes and full mip chains, ref scene.cpp:554-646).

    Mip level l >= 1 of a texture lives at x offset 2*TW - TW/2^(l-1) in the
    same rows, so a per-lane level turns into pure index arithmetic on one
    array (no per-level storage)."""
    data: jnp.ndarray   # (NT, TH, 2*TW, 4) f32 linear RGBA + mip atlas
    size: jnp.ndarray   # (NT, 2) i32 (h, w) level-0 extent
    wrap: jnp.ndarray   # (NT, 2) i32 (wrap_s, wrap_t): WRAP_* constants


class Lights(NamedTuple):
    """Punctual + emissive-triangle light sets with alias tables
    (ref scene.cpp:319-409, 700-772; host_device.h:295-333)."""
    punc_pos: jnp.ndarray        # (L, 3) f32
    punc_color: jnp.ndarray      # (L, 3) f32 intensity-scaled
    punc_dir: jnp.ndarray        # (L, 3) f32
    punc_type: jnp.ndarray       # (L,) i32
    punc_range: jnp.ndarray      # (L,) f32 (0 = unbounded)
    punc_cos_inner: jnp.ndarray  # (L,) f32 spot inner cone cos
    punc_cos_outer: jnp.ndarray  # (L,) f32
    punc_table: AliasTable
    num_punc: jnp.ndarray        # () i32 actual count (arrays are padded)
    trig_v0: jnp.ndarray         # (TL, 3) f32 world-space emissive triangles
    trig_v1: jnp.ndarray
    trig_v2: jnp.ndarray
    trig_emission: jnp.ndarray   # (TL, 3) f32 radiance
    trig_table: AliasTable
    num_trig: jnp.ndarray        # () i32
    trig_samp_prob: jnp.ndarray  # () f32 P(sample triangle | not env)
                                 # (ref LightBufInfo.trigSampProb, scene.cpp:101-105)


class EnvMap(NamedTuple):
    """HDR environment + solid-angle-weighted alias map
    (ref src/hdr_sampling.cpp:107-242)."""
    image: jnp.ndarray     # (He, We, 3) f32 linear radiance
    table: AliasTable      # over He*We texels
    integral: jnp.ndarray  # () f32 luminance integral over the sphere
    average: jnp.ndarray   # () f32 average luminance


class SunSkyParams(NamedTuple):
    """Procedural sun & sky configuration (ref SunAndSky, host_device.h:353-376;
    defaults sample_example.hpp:186-203)."""
    sun_direction: jnp.ndarray   # (3,) f32 unit, toward the sun
    sun_intensity: jnp.ndarray   # () f32 (the multiplier knob)
    sun_angular_radius: jnp.ndarray  # () f32 radians (disk core = NEE cone)
    turbidity: jnp.ndarray       # () f32 (= 2 + the reference's haze knob)
    ground_color: jnp.ndarray    # (3,) f32
    sky_tint: jnp.ndarray        # (3,) f32 multiplier (rgb_unit_conversion)
    enabled: jnp.ndarray         # () i32
    saturation: jnp.ndarray      # () f32 colour tweak (ref :292-355)
    redblueshift: jnp.ndarray    # () f32 in [-1, 1] (warm/cool shift)
    night_color: jnp.ndarray     # (3,) f32 floor when the sun sets
    sun_glow_intensity: jnp.ndarray  # () f32 glow around the disk
    ground_irradiance: jnp.ndarray  # (3,) f32 derived: hemisphere sky
                                    # irradiance (finalize_sunsky)


class Instancing(NamedTuple):
    """Per-instance indirection for shading when the scene is instanced
    (ref scene.cpp InstanceData / shade_state.glsl:63-90 instance->primMesh
    chase).  When present, the tri_* attribute arrays of SceneData are
    MESH-LOCAL pools shared by all instances of a mesh; a hit's global
    triangle id resolves to (instance, pool row) via tri_base, and normals/
    tangents (stored in object space) rotate into world space at gather
    time."""
    tri_base: jnp.ndarray    # (I,) i32 global tri base per instance (sorted)
    attr_base: jnp.ndarray   # (I,) i32 attr-pool row base of the mesh
    rot: jnp.ndarray         # (I, 9) f32 object->world linear part (row-major)
    nrm_rot: jnp.ndarray     # (I, 9) f32 inverse-transpose (normal matrix)
    # sign(det): a mirrored instance flips triangle WINDING, so the
    # GEOMETRIC normal (cross of world edges, which the reference and the
    # flattened path compute directly: shade_state.glsl) flips relative
    # to the normal-matrix-rotated object gn.  Applied to geo_nrm ONLY —
    # vertex normals are covectors (normal matrix, no flip) and the
    # bitangent's world cross(n_w, t_w) carries the det sign by itself
    # (round 3's extra hand_flip on tangent w double-flipped; fixed r4,
    # PARITY gap #3).
    det_sign: jnp.ndarray    # (I,) f32 sign(det(rot))
    area_scale: jnp.ndarray  # (I,) f32 world/object triangle-area ratio
    #                          (|det|^(2/3); exact for uniform scales)
    uvd_scale: jnp.ndarray   # (I,) f32 1/sqrt(area_scale): uv-density factor
    pmf_scale: jnp.ndarray   # (I,) f32 converts the pool's unnormalized
    #                          emissive weight (lum x mesh area) into the
    #                          world light-table pmf for this instance


def shade_row(scene: "SceneData", tid):
    """Resolve a global triangle id to (attr row, instance id).  Identity
    (inst None) on flattened scenes — the common fast path compiles to the
    plain gather."""
    if scene.inst is None:
        return tid, None
    i = (
        jnp.searchsorted(
            scene.inst.tri_base, tid, side="right"
        ).astype(jnp.int32)
        - 1
    )
    i = jnp.maximum(i, 0)
    row = scene.inst.attr_base[i] + (tid - scene.inst.tri_base[i])
    return row, i


def rot_apply(m9, x):
    """Apply gathered (..., 9) row-major 3x3 matrices to (..., 3) vectors."""
    return jnp.stack(
        [
            m9[..., 0] * x[..., 0] + m9[..., 1] * x[..., 1] + m9[..., 2] * x[..., 2],
            m9[..., 3] * x[..., 0] + m9[..., 4] * x[..., 1] + m9[..., 5] * x[..., 2],
            m9[..., 6] * x[..., 0] + m9[..., 7] * x[..., 1] + m9[..., 8] * x[..., 2],
        ],
        axis=-1,
    )


class SceneData(NamedTuple):
    """Everything the jitted frame function needs, as one pytree."""
    bvh: BVH
    tri_gn: jnp.ndarray        # (T,) u32 packed geometric normal
    tri_nrm: jnp.ndarray       # (T, 3) u32 packed per-vertex oct normals
    tri_uv: jnp.ndarray        # (T, 3, 2) f32
    tri_tangent: jnp.ndarray   # (T, 3) u32 packed per-vertex oct tangents
    tri_hand: jnp.ndarray      # (T, 3) f32 tangent handedness +-1
    tri_color: jnp.ndarray     # (T, 3) u32 packed vertex colours (unorm4x8)
    tri_mat: jnp.ndarray       # (T,) i32 material id
    tri_light_pmf: jnp.ndarray  # (T,) f32 alias-table pmf of this triangle as
                                # a light (0 = not emissive); used for MIS when
                                # a BSDF ray hits an emitter (pathtrace.glsl:74-88).
                                # Instanced scenes store the UNNORMALIZED mesh
                                # weight here; multiply by inst.pmf_scale.
    tri_light_area: jnp.ndarray  # (T,) f32 world-space area (for the same MIS pdf)
    tri_uv_density: jnp.ndarray  # (T,) f32 sqrt(uv_area/world_area): texture
                                 # footprint scale for mip selection
    materials: Materials
    textures: TexStack
    lights: Lights
    env: Optional[EnvMap]
    sunsky: SunSkyParams
    inst: Optional[Instancing] = None  # set on instanced scenes (tri_*
    #                                    arrays are then mesh-local pools)
    # opaque/alpha BVH split (set when the scene mixes both): `bvh` then
    # holds ONLY opaque geometry and `bvh_alpha` the alpha-tested rest,
    # both reporting ids in the same global numbering.  Rays pay ONE cheap
    # traversal (fused any-hit OR-drain for shadows) on the opaque bulk
    # and run the HitTest re-trace hops only inside the (small) alpha BVH
    # — the TPU-native analog of the reference paying anyhit shaders only
    # on alpha geometry (traceray_rq.glsl:58-102 HitTest + gl_RayFlags).
    bvh_alpha: Optional[BVH] = None


def default_sunsky() -> SunSkyParams:
    d = np.asarray([0.45, 0.78, 0.45], np.float32)
    d = d / np.linalg.norm(d)
    return SunSkyParams(
        sun_direction=d,
        sun_intensity=np.float32(1.0),
        sun_angular_radius=np.float32(0.00465),  # physical sun ~0.266 deg
        turbidity=np.float32(3.0),
        ground_color=np.asarray([0.4, 0.35, 0.3], np.float32),
        sky_tint=np.asarray([1.0, 1.0, 1.0], np.float32),
        enabled=np.int32(1),
        saturation=np.float32(1.0),
        redblueshift=np.float32(0.0),
        night_color=np.asarray([0.0, 0.0, 0.01], np.float32),
        sun_glow_intensity=np.float32(1.0),
        ground_irradiance=np.zeros(3, np.float32),  # set by finalize_sunsky
    )


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] >= n:
        return a
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


def build_lights(
    punc: dict | None,
    trig_v0: np.ndarray,
    trig_v1: np.ndarray,
    trig_v2: np.ndarray,
    trig_emission: np.ndarray,
) -> Lights:
    """Build punctual + triangle light tables with alias sampling.

    Weights: punctual lights by luminance * intensity (ref
    scene.cpp:700-726); emissive triangles by luminance * area
    (ref scene.cpp:741-772).  trig_samp_prob = triangle power fraction
    (ref LightBufInfo.trigSampProb, scene.cpp:101-105).
    """
    if punc is None:
        punc = {}
    ppos = np.asarray(punc.get("pos", np.zeros((0, 3))), np.float32)
    L = ppos.shape[0]
    pcol = np.asarray(punc.get("color", np.ones((L, 3))), np.float32)
    pdir = np.asarray(punc.get("dir", np.tile([0, -1, 0], (L, 1))), np.float32)
    ptype = np.asarray(punc.get("type", np.zeros(L)), np.int32)
    prange = np.asarray(punc.get("range", np.zeros(L)), np.float32)
    pci = np.asarray(punc.get("cos_inner", np.ones(L)), np.float32)
    pco = np.asarray(punc.get("cos_outer", np.full(L, 0.7)), np.float32)

    lum = np.array([0.2126, 0.7152, 0.0722])
    punc_w = (pcol * lum).sum(-1) if L else np.zeros(0)
    punc_table, punc_power = make_alias_table(punc_w if L else np.asarray([0.0]))

    TL = trig_v0.shape[0]
    if TL:
        e1 = trig_v1 - trig_v0
        e2 = trig_v2 - trig_v0
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        trig_w = (trig_emission * lum).sum(-1) * area
    else:
        trig_w = np.asarray([0.0])
    trig_table, trig_power = make_alias_table(trig_w)

    total = punc_power + trig_power
    trig_prob = trig_power / total if total > 0 else 0.0

    Lp = max(L, 1)
    TLp = max(TL, 1)
    return Lights(
        punc_pos=_pad_rows(ppos, Lp),
        punc_color=_pad_rows(pcol, Lp),
        punc_dir=_pad_rows(pdir, Lp),
        punc_type=_pad_rows(ptype, Lp),
        punc_range=_pad_rows(prange, Lp),
        punc_cos_inner=_pad_rows(pci, Lp),
        punc_cos_outer=_pad_rows(pco, Lp),
        punc_table=punc_table,
        num_punc=np.int32(L),
        trig_v0=_pad_rows(np.asarray(trig_v0, np.float32), TLp),
        trig_v1=_pad_rows(np.asarray(trig_v1, np.float32), TLp),
        trig_v2=_pad_rows(np.asarray(trig_v2, np.float32), TLp),
        trig_emission=_pad_rows(np.asarray(trig_emission, np.float32), TLp),
        trig_table=trig_table,
        num_trig=np.int32(TL),
        trig_samp_prob=np.float32(trig_prob),
    )


def make_materials(mats: list[dict]) -> Materials:
    """Build the SoA material table from a list of dicts (glTF-shaped keys)."""
    M = max(len(mats), 1)

    def col(key, default, shape=()):
        out = np.zeros((M,) + shape, np.float32) if shape else np.zeros(M, np.float32)
        for i in range(M):
            src = mats[i] if i < len(mats) else {}
            out[i] = np.asarray(src.get(key, default), np.float32)
        return out

    def icol(key, default):
        out = np.full(M, default, np.int32)
        for i in range(M):
            src = mats[i] if i < len(mats) else {}
            out[i] = int(src.get(key, default))
        return out

    return Materials(
        base_color=col("base_color", [1, 1, 1, 1], (4,)),
        emissive=col("emissive", [0, 0, 0], (3,)),
        metallic=col("metallic", 0.0),
        roughness=col("roughness", 0.5),
        ior=col("ior", 1.5),
        transmission=col("transmission", 0.0),
        base_tex=icol("base_tex", -1),
        mr_tex=icol("mr_tex", -1),
        normal_tex=icol("normal_tex", -1),
        emissive_tex=icol("emissive_tex", -1),
        alpha_mode=icol("alpha_mode", ALPHA_OPAQUE),
        alpha_cutoff=col("alpha_cutoff", 0.5),
        double_sided=icol("double_sided", 0),
    )


def _mip_down(img: np.ndarray) -> np.ndarray:
    """One box-filter mip reduction (pads odd extents by edge clamp)."""
    h, w = img.shape[:2]
    if h > 1 and h % 2:
        img = np.concatenate([img, img[-1:]], axis=0)
        h += 1
    if w > 1 and w % 2:
        img = np.concatenate([img, img[:, -1:]], axis=1)
        w += 1
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    out = img
    if h > 1:
        out = out.reshape(nh, 2, out.shape[1], 4).mean(axis=1)
    if w > 1:
        out = out.reshape(out.shape[0], nw, 2, 4).mean(axis=2)
    return out


def make_tex_stack(textures: list | None) -> TexStack:
    """Pad textures to a uniform (NT, TH, 2*TW, 4) stack with a box-filter
    mip atlas.  Entries are arrays or dicts {"image", "wrap_s", "wrap_t"}
    (WRAP_* constants; default repeat, ref scene.cpp:554-646 sampler
    translation).  Empty scene gets a 1x1 white texel."""
    if not textures:
        return TexStack(
            data=np.ones((1, 1, 2, 4), np.float32),
            size=np.ones((1, 2), np.int32),
            wrap=np.zeros((1, 2), np.int32),
        )
    entries = []
    for t in textures:
        if isinstance(t, dict):
            entries.append(
                (np.asarray(t["image"], np.float32),
                 int(t.get("wrap_s", WRAP_REPEAT)),
                 int(t.get("wrap_t", WRAP_REPEAT)))
            )
        else:
            entries.append((np.asarray(t, np.float32), WRAP_REPEAT, WRAP_REPEAT))
    # real textures pad to >= 2x2 so the 1x1 stack shape uniquely means
    # "no textures" (sample_texture skips all gathers statically on it)
    th = max(2, max(t[0].shape[0] for t in entries))
    tw = max(2, max(t[0].shape[1] for t in entries))
    nt = len(entries)
    data = np.zeros((nt, th, 2 * tw, 4), np.float32)
    size = np.zeros((nt, 2), np.int32)
    wrap = np.zeros((nt, 2), np.int32)
    for i, (t, ws, wt) in enumerate(entries):
        if t.ndim == 2:
            t = t[..., None].repeat(3, -1)
        if t.shape[-1] == 3:
            t = np.concatenate([t, np.ones(t.shape[:-1] + (1,), np.float32)], -1)
        data[i, : t.shape[0], : t.shape[1]] = t
        size[i] = (t.shape[0], t.shape[1])
        wrap[i] = (ws, wt)
        # mip chain: level l at x offset 2*tw - tw >> (l-1)
        level = t
        l = 1
        while (level.shape[0] > 1 or level.shape[1] > 1) and (
            tw >> (l - 1)
        ) >= 1:
            level = _mip_down(level)
            xoff = 2 * tw - (tw >> (l - 1))
            data[i, : level.shape[0], xoff : xoff + level.shape[1]] = level
            l += 1
    return TexStack(data=data, size=size, wrap=wrap)


def upload_scene(
    v0: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    *,
    normals: np.ndarray | None = None,      # (T, 3, 3) per-vertex
    uvs: np.ndarray | None = None,          # (T, 3, 2)
    tangents: np.ndarray | None = None,     # (T, 3, 4) xyz + handedness w
    colors: np.ndarray | None = None,       # (T, 3, 4)
    mat_ids: np.ndarray | None = None,      # (T,)
    materials: list[dict] | None = None,
    textures: list[np.ndarray] | None = None,
    punctual: dict | None = None,
    env: EnvMap | None = None,
    sunsky: SunSkyParams | None = None,
) -> SceneData:
    """Flatten world-space triangle soup into SceneData + BVH.

    Emissive triangles (material emissive luminance > 0) are extracted into
    the triangle-light set automatically (ref scene.cpp:355-409)."""
    v0, v1, v2, prep = _prep_attrs(
        v0, v1, v2, normals, uvs, tangents, colors, mat_ids
    )
    uvs, mat_ids = prep["uv"], prep["mat"]
    if materials is None:
        materials = [{}]

    mat_table = make_materials(materials)

    # emissive triangle extraction (ref scene.cpp:355-409)
    em = np.zeros((len(materials), 3), np.float32)
    for i, m in enumerate(materials):
        em[i] = np.asarray(m.get("emissive", [0, 0, 0]), np.float32)
    lum = (em * [0.2126, 0.7152, 0.0722]).sum(-1)
    emissive_mask = lum[np.asarray(mat_ids)] > 0.0
    lights = build_lights(
        punctual,
        v0[emissive_mask],
        v1[emissive_mask],
        v2[emissive_mask],
        em[np.asarray(mat_ids)][emissive_mask],
    )
    # tri -> light pmf + area for emitter-hit MIS (0 for non-emissive tris)
    tri_light_pmf = np.zeros(v0.shape[0], np.float32)
    if emissive_mask.any():
        tri_light_pmf[emissive_mask] = np.asarray(lights.trig_table.pdf)[
            : int(emissive_mask.sum())
        ]

    # Everything is built host-side in numpy, then shipped with ONE
    # device_put per dtype (SURVEY §5.8; replaces the reference's 4-queue
    # async upload, main.cpp:151-162).
    from ..utils.transfer import batched_device_put
    from .sunsky import finalize_sunsky  # (local import: avoids cycle)

    sunsky = finalize_sunsky(
        sunsky if sunsky is not None else default_sunsky()
    )

    # opaque/alpha BVH split: alpha-tested triangles (MASK/BLEND material)
    # go to their own BVH so the HitTest re-trace hops never touch the
    # opaque bulk (see SceneData.bvh_alpha)
    T = v0.shape[0]
    alpha_tri = (
        np.asarray(mat_table.alpha_mode)[np.asarray(mat_ids)] != ALPHA_OPAQUE
    )
    if alpha_tri.any() and not alpha_tri.all():
        op = np.nonzero(~alpha_tri)[0].astype(np.int32)
        al = np.nonzero(alpha_tri)[0].astype(np.int32)
        bvh = build_bvh(v0[op], v1[op], v2[op], as_numpy=True,
                        prim_ids=op, n_tris_global=T)
        bvh_alpha = build_bvh(v0[al], v1[al], v2[al], as_numpy=True,
                              prim_ids=al, n_tris_global=T)
    else:
        bvh = build_bvh(v0, v1, v2, as_numpy=True)
        bvh_alpha = None

    scene = SceneData(
        bvh=bvh,
        bvh_alpha=bvh_alpha,
        tri_gn=prep["gn"],
        tri_nrm=prep["nrm"],
        tri_uv=prep["uv"],
        tri_tangent=prep["tangent"],
        tri_hand=prep["hand"],
        tri_color=prep["color"],
        tri_mat=prep["mat"],
        tri_light_pmf=tri_light_pmf,
        tri_light_area=prep["area"],
        tri_uv_density=prep["uvd"],
        materials=mat_table,
        textures=make_tex_stack(textures),
        lights=lights,
        env=env,
        sunsky=sunsky,
    )
    return batched_device_put(scene)


def _prep_attrs(v0, v1, v2, normals, uvs, tangents, colors, mat_ids):
    """Default + pack the per-triangle attribute arrays (shared by the
    flattened and instanced upload paths).  Returns (v0, v1, v2, dict of
    packed SoA arrays)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    T = v0.shape[0]

    gn = np.cross(v1 - v0, v2 - v0)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    if normals is None:
        normals = np.repeat(gn[:, None, :], 3, axis=1)
    if uvs is None:
        uvs = np.zeros((T, 3, 2), np.float32)
    if tangents is None:
        # arbitrary tangent orthogonal to the normal
        n = normals[:, 0]
        a = np.where(np.abs(n[:, 0:1]) < 0.9, [[1.0, 0, 0]], [[0, 1.0, 0]])
        t = np.cross(a, n)
        t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
        tangents = np.concatenate(
            [np.repeat(t[:, None], 3, axis=1), np.ones((T, 3, 1), np.float32)], -1
        )
    if colors is None:
        colors = np.ones((T, 3, 4), np.float32)
    if mat_ids is None:
        mat_ids = np.zeros(T, np.int32)

    area = (
        0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    ).astype(np.float32)
    # uv-space density for mip selection: texels-per-meter modulo resolution
    uv_e1 = uvs[:, 1] - uvs[:, 0]
    uv_e2 = uvs[:, 2] - uvs[:, 0]
    uv_area = 0.5 * np.abs(uv_e1[:, 0] * uv_e2[:, 1] - uv_e1[:, 1] * uv_e2[:, 0])
    uvd = np.sqrt(uv_area / np.maximum(area, 1e-20)).astype(np.float32)

    return v0, v1, v2, {
        "gn": octa.encode_unit_u32_np(gn),
        "nrm": octa.encode_unit_u32_np(np.asarray(normals, np.float32)),
        "uv": np.asarray(uvs, np.float32),
        "tangent": octa.encode_unit_u32_np(
            np.asarray(tangents, np.float32)[..., :3]
        ),
        "hand": np.asarray(tangents, np.float32)[..., 3],
        "color": octa.pack_unorm4x8_np(np.asarray(colors, np.float32)),
        "mat": np.asarray(mat_ids, np.int32),
        "area": area,
        "uvd": uvd,
    }


def upload_scene_instanced(
    meshes: list[dict],
    instances: list[tuple[int, np.ndarray]],
    *,
    materials: list[dict] | None = None,
    textures: list[np.ndarray] | None = None,
    punctual: dict | None = None,
    env: EnvMap | None = None,
    sunsky: SunSkyParams | None = None,
) -> SceneData:
    """Instanced upload: shared OBJECT-space attribute pools + a two-level
    BVH, so N instances of one mesh cost ~1x the mesh's memory
    (ref src/accelstruct.cpp:132-162 TLAS-over-BLAS; VERDICT r2 #4).

    meshes: [{"v0", "v1", "v2", optional "normals"/"uvs"/"tangents"/
    "colors"/"mat_ids"}] in object space; instances: [(mesh_index,
    4x4-or-3x4 object->world)].  Emissive instanced triangles ARE baked to
    world per instance for the NEE light table (exact; emitters are a tiny
    subset), while emitter-hit MIS resolves through inst.pmf_scale.
    """
    from ..ops.bvh_instanced import build_instanced_bvh

    if materials is None:
        materials = [{}]
    mat_table = make_materials(materials)

    preps, mesh_v = [], []
    for m in meshes:
        mv0, mv1, mv2, prep = _prep_attrs(
            m["v0"], m["v1"], m["v2"], m.get("normals"), m.get("uvs"),
            m.get("tangents"), m.get("colors"), m.get("mat_ids"),
        )
        preps.append(prep)
        mesh_v.append((mv0, mv1, mv2))
    pool = {
        k: np.concatenate([p[k] for p in preps], axis=0)
        for k in preps[0]
    }
    attr_base_mesh = np.zeros(len(meshes) + 1, np.int64)
    for k, (mv0, _, _) in enumerate(mesh_v):
        attr_base_mesh[k + 1] = attr_base_mesh[k] + mv0.shape[0]

    # material emissive luminance per pool triangle
    em = np.zeros((len(materials), 3), np.float32)
    for i, m in enumerate(materials):
        em[i] = np.asarray(m.get("emissive", [0, 0, 0]), np.float32)
    lum_mat = (em * [0.2126, 0.7152, 0.0722]).sum(-1)
    pool_lum = lum_mat[pool["mat"]]
    pool_em_mask = pool_lum > 0.0
    # pool pmf holds the UNNORMALIZED object-space weight (lum x mesh area);
    # inst.pmf_scale turns it into the world pmf per instance
    pool_w = np.where(pool_em_mask, pool_lum * pool["area"], 0.0).astype(
        np.float32
    )

    # --- per-instance transforms -----------------------------------------
    I = len(instances)
    mesh_of = np.asarray([mi for (mi, _) in instances], np.int64)
    mats3x4 = []
    for _, m in instances:
        m = np.asarray(m, np.float64)
        mats3x4.append(m.reshape(-1, 4)[:3] if m.size == 12
                       else m.reshape(4, 4)[:3])
    rot = np.stack([m[:3, :3] for m in mats3x4])          # (I, 3, 3)
    det = np.linalg.det(rot)
    nrm_rot = np.stack([np.linalg.inv(r).T for r in rot])
    area_scale = np.abs(det) ** (2.0 / 3.0)
    tri_base = np.zeros(I, np.int64)
    acc = 0
    for k in range(I):
        tri_base[k] = acc
        acc += mesh_v[mesh_of[k]][0].shape[0]

    # --- world-space emissive triangles (exact, per instance) ------------
    ev0, ev1, ev2, eem, e_inst_rows = [], [], [], [], []
    for k in range(I):
        mi = mesh_of[k]
        sl = slice(attr_base_mesh[mi], attr_base_mesh[mi + 1])
        mask = pool_em_mask[sl]
        if not mask.any():
            continue
        r3, t3 = mats3x4[k][:3, :3], mats3x4[k][:3, 3]
        mv0, mv1, mv2 = mesh_v[mi]
        ev0.append((mv0[mask] @ r3.T + t3).astype(np.float32))
        ev1.append((mv1[mask] @ r3.T + t3).astype(np.float32))
        ev2.append((mv2[mask] @ r3.T + t3).astype(np.float32))
        eem.append(em[pool["mat"][sl][mask]])
    cat = lambda xs, c: (np.concatenate(xs) if xs
                         else np.zeros((0, c), np.float32))
    lights = build_lights(
        punctual, cat(ev0, 3), cat(ev1, 3), cat(ev2, 3), cat(eem, 3)
    )
    # world pmf of instance k's emissive tri = pool_w * area_scale[k] / W;
    # W = total emissive world weight (same normalizer the alias table used)
    if ev0:
        e1w = cat(ev1, 3) - cat(ev0, 3)
        e2w = cat(ev2, 3) - cat(ev0, 3)
        w_area = 0.5 * np.linalg.norm(np.cross(e1w, e2w), axis=-1)
        w_lum = (cat(eem, 3) * [0.2126, 0.7152, 0.0722]).sum(-1)
        W = float((w_area * w_lum).sum())
    else:
        W = 0.0
    pmf_scale = (area_scale / W if W > 0 else np.zeros(I)).astype(np.float32)

    from ..utils.transfer import batched_device_put
    from .sunsky import finalize_sunsky

    sunsky = finalize_sunsky(
        sunsky if sunsky is not None else default_sunsky()
    )

    inst = Instancing(
        tri_base=tri_base.astype(np.int32),
        attr_base=attr_base_mesh[mesh_of].astype(np.int32),
        rot=rot.reshape(I, 9).astype(np.float32),
        nrm_rot=nrm_rot.reshape(I, 9).astype(np.float32),
        det_sign=np.sign(det).astype(np.float32),
        area_scale=area_scale.astype(np.float32),
        uvd_scale=(1.0 / np.sqrt(np.maximum(area_scale, 1e-20))).astype(
            np.float32
        ),
        pmf_scale=pmf_scale,
    )
    # opaque/alpha BVH split at the mesh-primitive level (glTF primitives
    # are single-material, so per-mesh triangle masks are exact): each
    # split half is an instanced BVH over the subset, reporting ids in the
    # SAME virtual numbering (tri_base/mesh_tris_full overrides)
    alpha_mode_np = np.asarray(mat_table.alpha_mode)
    mesh_alpha_masks = []
    for k in range(len(meshes)):
        sl = slice(attr_base_mesh[k], attr_base_mesh[k + 1])
        mesh_alpha_masks.append(
            alpha_mode_np[pool["mat"][sl]] != ALPHA_OPAQUE
        )
    mesh_tris_full = [int(m.shape[0]) for m in mesh_alpha_masks]
    any_alpha = any(m.any() for m in mesh_alpha_masks)
    all_alpha = all(m.all() for m in mesh_alpha_masks)
    n_virtual = int(tri_base[-1]) + mesh_tris_full[mesh_of[-1]] if I else 0

    def _subset_bvh(want_alpha: bool):
        sel_meshes, sel_ids, sel_full, remap = [], [], [], {}
        for k, mask in enumerate(mesh_alpha_masks):
            keep = mask if want_alpha else ~mask
            if not keep.any():
                continue
            idx = np.nonzero(keep)[0].astype(np.int32)
            mv0, mv1, mv2 = mesh_v[k]
            remap[k] = len(sel_meshes)
            sel_meshes.append((mv0[idx], mv1[idx], mv2[idx]))
            sel_ids.append(idx)
            sel_full.append(mesh_tris_full[k])
        sel_inst, sel_base = [], []
        for i, (mi, m) in enumerate(instances):
            if mi in remap:
                sel_inst.append((remap[mi], m))
                sel_base.append(int(tri_base[i]))
        leaf = os.environ.get("EIDOLA_ALPHA_LEAF") if want_alpha else None
        return build_instanced_bvh(
            sel_meshes, sel_inst,
            mesh_prim_ids=sel_ids, mesh_tris_full=sel_full,
            inst_tri_base_override=np.asarray(sel_base, np.int64),
            n_tris_virtual=n_virtual,
            leaf_size=int(leaf) if leaf else None,
        )

    def _flat_alpha_bvh():
        """World-space FLAT BVH over the alpha subset (ids stay in the
        shared virtual numbering, so shading is unchanged).  The alpha set
        is typically a small fraction of the scene (foliage), so paying
        ~130 B/tri of flattened leaf+coefficient data buys: no per-event
        instance-transform indirection in the drain, no per-instance walk
        topology duplication, and a GLOBAL world-space SAH that splits
        between canopies instead of replaying one object-space tree under
        every instance."""
        v0w, v1w, v2w, ids = [], [], [], []
        for i, (mi, _) in enumerate(instances):
            mask = mesh_alpha_masks[mi]
            if not mask.any():
                continue
            idx = np.nonzero(mask)[0]
            mv0, mv1, mv2 = mesh_v[mi]
            r3, t3 = mats3x4[i][:3, :3], mats3x4[i][:3, 3]
            v0w.append((mv0[idx] @ r3.T + t3).astype(np.float32))
            v1w.append((mv1[idx] @ r3.T + t3).astype(np.float32))
            v2w.append((mv2[idx] @ r3.T + t3).astype(np.float32))
            ids.append((idx + int(tri_base[i])).astype(np.int32))
        from ..ops.bvh import build_bvh

        leaf = os.environ.get("EIDOLA_ALPHA_LEAF")
        return build_bvh(
            np.concatenate(v0w), np.concatenate(v1w), np.concatenate(v2w),
            prim_ids=np.concatenate(ids), n_tris_global=n_virtual,
            leaf_size=int(leaf) if leaf else None,
        )

    # measured on v5 lite (PERF_NOTES round 5): the flat world-space alpha
    # BVH beats the grafted instanced walk 354 -> 300 ms on the mandatory
    # alpha closest-hit at ~370 MB HBM for Bistro-scale foliage tables
    alpha_flat = os.environ.get("EIDOLA_ALPHA_FLAT", "1") == "1"
    if any_alpha and not all_alpha:
        bvh = _subset_bvh(False)
        bvh_alpha = _flat_alpha_bvh() if alpha_flat else _subset_bvh(True)
    else:
        bvh = build_instanced_bvh(mesh_v, instances)
        bvh_alpha = None

    scene = SceneData(
        bvh=bvh,
        bvh_alpha=bvh_alpha,
        tri_gn=pool["gn"],
        tri_nrm=pool["nrm"],
        tri_uv=pool["uv"],
        tri_tangent=pool["tangent"],
        tri_hand=pool["hand"],
        tri_color=pool["color"],
        tri_mat=pool["mat"],
        tri_light_pmf=pool_w,
        tri_light_area=pool["area"],
        tri_uv_density=pool["uvd"],
        materials=mat_table,
        textures=make_tex_stack(textures),
        lights=lights,
        env=env,
        sunsky=sunsky,
        inst=inst,
    )
    return batched_device_put(scene)


def attach_env(scene: SceneData, env: EnvMap) -> SceneData:
    """Swap the HDR environment on a loaded scene (ref
    SampleExample::loadEnvironmentHdr + updateHdrDescriptors,
    sample_example.cpp:97-106,141-151).  Callers that hold RenderParams
    should pass them through `env_params` afterwards — the reference
    re-derives the firefly clamp from the env integral on every HDR load."""
    return scene._replace(env=env)


def env_params(params, env: EnvMap):
    """Re-derive env-dependent RenderParams after an HDR (re)load:
    fireflyClampThreshold = 4 x env luminance integral (ref
    SampleExample::loadEnvironmentHdr, sample_example.cpp:104)."""
    import jax.numpy as jnp

    return params._replace(
        firefly_clamp=jnp.asarray(4.0 * float(env.integral), jnp.float32)
    )
