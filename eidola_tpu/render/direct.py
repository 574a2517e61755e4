"""ReSTIR DI direct stage: G-buffer + RIS + visibility + temporal reuse
(ref shaders/direct_stage.comp:129-289; split-pass variants direct_gen/
direct_reuse are subsumed by the fused path, ref renderer.cpp:166-172).

Per frame, full resolution, fully SoA over (H, W):
  primary hit -> motion vector + packed G-buffer
  RIS over M light candidates (no visibility)         [K1:188-199]
  one shadow ray for the winner, zero on occlusion    [K1:200-207]
  temporal merge via motion-indexed history reservoir
  with normal/depth/matHash gates                     [K1:47-84, 209-217]
  optional spatial disk-neighbour merge rounds        [K1:86-121, 224-255]
  M-clamp, shade winner, firefly clamp, HDR->LDR      [K1:219-222, 256-288]

Shading is albedo-demodulated (BSDF evaluated with albedo=1) so the denoiser
filters pure illumination; compose re-modulates (ref K1:178-179, compose.comp).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import reservoir as resv
from ..ops import rng as erng
from ..ops.halo import halo_gather, halo_gather_tree

from ..ops.math import (
    clamp_radiance,
    dot3,
    hdr_to_ldr,
    luminance,
    make_frame,
    offset_ray,
    to_local,
)
from ..scene.camera import Camera, project_to_pixel, spawn_rays
from ..scene.data import SceneData
from .bsdf import BsdfParams, eval_bsdf
from .config import (
    RESTIR_NONE,
    RESTIR_SPATIAL,
    RESTIR_SPATIOTEMPORAL,
    RESTIR_TEMPORAL,
    RenderConfig,
    RenderParams,
)
from .gbuffer import GBuffer, GBufferView, center_rays, decode_gbuffer, pack_gbuffer
from .pathtrace import sample_direct_light
from .shade_state import State, get_state

_TMIN = 1e-4
_TMAX = 1e8


class DirectOut(NamedTuple):
    illum_ldr: jnp.ndarray   # (H, W, 3) demodulated direct illumination (LDR-compressed)
    emission: jnp.ndarray    # (H, W, 3) emitter/env passthrough (not denoised)
    gbuf: GBuffer
    view: GBufferView        # decoded current G-buffer (reused downstream)
    motion: jnp.ndarray      # (H, W, 2) i32 last-frame pixel (y, x); -1 invalid
    resv: dict               # DI reservoirs to carry into the next frame
    state: State             # full shading state of the primary hit
    vis: jnp.ndarray         # (H, W) f32 winner visibility carry
    #                          (1 visible / 0 occluded / -1 unknown; only
    #                          meaningful when cfg.shadow_cadence > 1)


def _demod_bsdf(state: State) -> BsdfParams:
    return BsdfParams(
        albedo=jnp.ones_like(state.albedo),
        metallic=state.metallic,
        roughness=state.roughness,
    )


def _phat(state: State, wo, li, wi):
    """ReSTIR DI target function at a surface: luminance of unshadowed
    demodulated contribution (ref direct_stage.comp RIS loop)."""
    t, b = make_frame(state.nrm)
    wo_l = to_local(t, b, state.nrm, wo)
    wi_l = to_local(t, b, state.nrm, wi)
    f = eval_bsdf(_demod_bsdf(state), wo_l, wi_l)
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)
    return luminance(li * f) * cos_i


def _shade(state: State, wo, li, wi):
    """Full demodulated contribution vector (before W)."""
    t, b = make_frame(state.nrm)
    wo_l = to_local(t, b, state.nrm, wo)
    wi_l = to_local(t, b, state.nrm, wi)
    f = eval_bsdf(_demod_bsdf(state), wo_l, wi_l)
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)
    return li * f * cos_i[..., None]


def _empty_sample(h, w):
    return {
        "li": jnp.zeros((h, w, 3), jnp.float32),
        "wi": jnp.zeros((h, w, 3), jnp.float32),
        "dist": jnp.zeros((h, w), jnp.float32),
    }


def empty_di_reservoir(h: int, w: int) -> dict:
    return resv.make_reservoir(_empty_sample(h, w), (h, w))


def _temporal_gates(view: GBufferView, hist: GBufferView):
    """Reprojection acceptance gates (ref direct_stage.comp:47-84):
    normal dot > 0.9, depth within 5%, material hash equal."""
    n_ok = dot3(view.nrm, hist.nrm) > 0.9
    d_ok = jnp.abs(view.depth - hist.depth) < 0.05 * jnp.maximum(view.depth, 1e-3)
    m_ok = view.mat_hash == hist.mat_hash
    return view.valid & hist.valid & n_ok & d_ok & m_ok


def direct_stage(
    cfg: RenderConfig,
    scene: SceneData,
    params: RenderParams,
    cam: Camera,
    prev_gbuf: GBuffer,
    prev_resv: dict,
    prev_cam: Camera,
    rng_state,
    prev_vis=None,
    frame_idx=None,
) -> tuple[jnp.ndarray, DirectOut]:
    h, w = cfg.height, cfg.width
    R = h * w

    # --- primary hit ------------------------------------------------- K1:280
    from .tracer import trace_closest, trace_occlusion

    rng_state, o, d = spawn_rays(cam, h, w, rng_state)
    t_max0 = jnp.full((h, w), _TMAX)
    if cfg.primary_seed and scene.bvh.slot_of_tri is not None:
        # re-test LAST frame's hit triangle at this pixel: a hit is a real
        # intersection of the CURRENT ray, so its t is an exact upper
        # bound — the walk prunes everything behind it from step 0.
        # Instanced scenes re-test in the instance's OBJECT space (the
        # unnormalized transformed direction keeps t identical across
        # spaces, ops/bvh_instanced.py design note).
        from ..ops.intersect import ray_triangle

        pt = prev_gbuf.tri
        ptc = jnp.maximum(pt, 0)
        slot = scene.bvh.slot_of_tri[ptc]
        row = scene.bvh.leaf_blocks.reshape(-1, 12)[slot]      # (H, W, 12)
        # slot/inst tables hold -1 for ids this BVH does not own (the
        # opaque/alpha split's other half, unoccupied entries): a -1 wraps
        # the gather to the LAST pool row — on instanced scenes that
        # re-tests one mesh's triangle under another instance's inverse
        # transform, a phantom hit whose t would wrongly bound t_max0 and
        # make the primary trace miss real geometry.  Guard unconditionally.
        if scene.inst is None:
            o_t, d_t = o, d
        else:
            xf = scene.bvh.inst_inv[scene.bvh.inst_of_tri[ptc]]  # (H,W,12)
            r = xf.reshape(xf.shape[:-1] + (3, 4))
            o_t = jnp.einsum("...ij,...j->...i", r[..., :3], o) + r[..., 3]
            d_t = jnp.einsum("...ij,...j->...i", r[..., :3], d)
        p_hit, p_t, _, _ = ray_triangle(
            o_t, d_t, row[..., 0:3], row[..., 3:6], row[..., 6:9],
            _TMIN, _TMAX,
        )
        ok = (pt >= 0) & (slot >= 0) & p_hit
        if cfg.alpha_geometry:
            # only OPAQUE predicted hits may bound the trace: an alpha
            # hit could be discarded by HitTest, and a bound at its t
            # would wrongly cut the re-trace past it
            from ..scene.data import shade_row

            arow, _ = shade_row(scene, ptc)
            ok &= scene.materials.alpha_mode[scene.tri_mat[arow]] == 0
        t_max0 = jnp.where(ok, p_t * (1.0 + 1e-4) + 1e-6, t_max0)
    rng_state, rec = trace_closest(
        cfg, scene, o, d, jnp.full((h, w), _TMIN), t_max0,
        rng_state, coherent=True,
    )
    t_hit = rec.t
    # ray-cone angle per pixel for texture mip selection: 2 tan(fovy/2) / h
    cone = (2.0 * cam.proj_inv[1, 1] / h) if cfg.texture_mips else None
    state = get_state(scene, o, d, rec.tri, t_hit, rec.u, rec.v,
                      cone_angle=cone)
    wo = -d

    # --- emission / env passthrough ------------------------------ K1:154-174
    from .pathtrace import env_radiance

    env = env_radiance(cfg, scene, params, d)
    emission = jnp.where(state.valid[..., None], state.emission, env)

    # --- G-buffer + motion vector -------------------------------- K1:131-165
    gbuf = pack_gbuffer(state, t_hit, rec.tri)
    view = decode_gbuffer(gbuf, cam.pos, center_rays(cam, h, w))
    py, px, inside = project_to_pixel(cam.last_proj_view, state.pos, h, w)
    mvalid = inside & state.valid
    motion = jnp.stack(
        [
            jnp.where(mvalid, jnp.clip(py.astype(jnp.int32), 0, h - 1), -1),
            jnp.where(mvalid, jnp.clip(px.astype(jnp.int32), 0, w - 1), -1),
        ],
        axis=-1,
    )

    use_restir = cfg.restir_mode != RESTIR_NONE

    # --- RIS candidate loop -------------------------------------- K1:188-199
    r = empty_di_reservoir(h, w)
    n_candidates = cfg.ris_sample_num if use_restir else 1
    for _ in range(n_candidates):
        rng_state, ls = sample_direct_light(cfg, scene, params, state.pos, rng_state)
        p_hat = _phat(state, wo, ls.li, ls.wi)
        wgt = jnp.where(ls.pdf > 1e-12, p_hat / jnp.maximum(ls.pdf, 1e-12), 0.0)
        rng_state, u = erng.rand(rng_state)
        r = resv.resv_update(
            r, {"li": ls.li, "wi": ls.wi, "dist": ls.dist}, wgt, u
        )

    # --- reprojection gates (shared by temporal merge + visibility reuse)
    temporal_on = cfg.restir_mode in (RESTIR_TEMPORAL, RESTIR_SPATIOTEMPORAL)
    use_vis_reuse = cfg.shadow_cadence > 1 and prev_vis is not None
    gates = None
    mot_y = mot_x = None
    if temporal_on or use_vis_reuse:
        prev_view = decode_gbuffer(
            prev_gbuf, prev_cam.pos, center_rays(prev_cam, h, w)
        )
        mot_y = jnp.clip(motion[..., 0], 0, h - 1)
        mot_x = jnp.clip(motion[..., 1], 0, w - 1)
        hist_view, in_halo = halo_gather_tree(
            prev_view, mot_y, mot_x, cfg.temporal_halo
        )
        gates = (_temporal_gates(view, hist_view) & (motion[..., 0] >= 0)
                 & in_halo)

    # --- shadow ray for the RIS winner --------------------------- K1:200-207
    sel = r["sample"]
    origin = offset_ray(
        state.pos,
        jnp.where(dot3(state.geo_nrm, sel["wi"])[..., None] >= 0,
                  state.geo_nrm, -state.geo_nrm),
    )
    # winner shadow rays point at per-pixel light picks; their ORIGINS are
    # raster-coherent, and measured on v5 lite the raw image-tile packets
    # beat the sorted wavefront (383 vs 500 ms DI stage at 1080p — the
    # sort+permute overhead exceeds its coherence gain here,
    # docs/PERF_NOTES.md).  Alpha-tested scenes keep the sorted
    # trace_occlusion (it carries the stochastic HitTest re-trace).
    need = state.valid & (r["weight"] > 0.0)
    if use_vis_reuse:
        # visibility reuse (VERDICT r2 #3a): only ~1/cadence of 8x16
        # ray-packet tiles re-validate; the rest reuse the reprojected
        # visibility of the last validated winner.  The mask is per TILE
        # so skipped packets retire from the traversal in one step (a
        # per-pixel checker would leave every packet live).
        from ..ops.packets import TILE_H, TILE_W

        fi = (jnp.asarray(0, jnp.uint32) if frame_idx is None
              else frame_idx.astype(jnp.uint32))
        ty = jnp.arange(h, dtype=jnp.uint32)[:, None] // TILE_H
        tx = jnp.arange(w, dtype=jnp.uint32)[None, :] // TILE_W
        tile_id = ty * jnp.uint32(-(-w // TILE_W)) + tx
        tile_rand = erng.tea(tile_id, jnp.broadcast_to(fi, tile_id.shape))
        tile_active = (tile_rand % jnp.uint32(cfg.shadow_cadence)) == 0
        vis_prev, _ = halo_gather(prev_vis, mot_y, mot_x, cfg.temporal_halo)
        vis_known = gates & (vis_prev >= 0.0)
        must = need & (tile_active | ~vis_known)
        shadow_tmax = jnp.where(must, sel["dist"] * 0.999, -1.0)
    else:
        must = need
        shadow_tmax = jnp.where(need, sel["dist"] * 0.999, -1.0)
    # winner shadow rays keep raster-coherent image-tile packets for the
    # (opaque) any-hit; alpha scenes march the residual through the small
    # alpha BVH inside trace_occlusion (opaque/alpha split)
    rng_state, occluded = trace_occlusion(
        cfg, scene, origin, sel["wi"],
        jnp.full((h, w), _TMIN), shadow_tmax, rng_state,
        coherent=os.environ.get("EIDOLA_DI_SHADOW", "tiled") == "tiled",
    )
    if use_vis_reuse:
        occluded = jnp.where(must, occluded, vis_prev < 0.5)
        vis_out = jnp.where(
            need, jnp.where(occluded, 0.0, 1.0), -1.0
        )
    else:
        vis_out = jnp.where(
            need, jnp.where(occluded, 0.0, 1.0), -1.0
        )
    r["weight"] = jnp.where(occluded | ~state.valid, 0.0, r["weight"])

    # --- temporal reuse ------------------------------------- K1:47-84,209-217
    if temporal_on:
        hist_resv, _ = halo_gather_tree(
            prev_resv, mot_y, mot_x, cfg.temporal_halo
        )
        rng_state, u = erng.rand(rng_state)
        r = resv.resv_merge_same_target(r, hist_resv, u, enabled=gates)

    # --- clamp + save carry (PRE-spatial) ------------------------ K1:219-222
    # The reference saves the clamped, pre-spatial reservoir for next-frame
    # temporal reuse (saveNewReservoir(tempResv) BEFORE the spatial block) so
    # spatial correlations never compound through the temporal chain.
    if use_restir:
        carry = resv.resv_clamp(
            resv.resv_check(r), cfg.ris_sample_num * params.reservoir_clamp
        )
    else:
        carry = resv.resv_check(r)

    # --- spatial reuse rounds ------------------------------- K1:86-121,224-255
    if cfg.restir_mode in (RESTIR_SPATIAL, RESTIR_SPATIOTEMPORAL):
        rng_state, r = _spatial_reuse(cfg, view, r, rng_state)

    # --- shade ---------------------------------------------------- K1:256-288
    # (shading uses the unclamped post-spatial reservoir like the reference;
    # W = wSum/(M pHat) is invariant to the proportional clamp anyway)
    r = resv.resv_check(r)
    sel = r["sample"]
    p_hat_sel = _phat(state, wo, sel["li"], sel["wi"])
    big_w = resv.resv_big_w(r, p_hat_sel)
    illum = _shade(state, wo, sel["li"], sel["wi"]) * big_w[..., None]
    illum = jnp.where(state.valid[..., None], illum, 0.0)
    illum = clamp_radiance(illum, params.firefly_clamp)
    illum_ldr = hdr_to_ldr(illum)

    return rng_state, DirectOut(
        illum_ldr=illum_ldr,
        emission=emission,
        gbuf=gbuf,
        view=view,
        motion=motion,
        resv=carry,
        state=state,
        vis=vis_out,
    )


def _spatial_gates(view: GBufferView, n_view: GBufferView):
    """Spatial acceptance gates (ref direct_stage.comp:95-105
    findSpatialNeighbor): normal dot > 0.5, depth within 10%, NO
    material-hash test — looser than the temporal gates."""
    n_ok = dot3(view.nrm, n_view.nrm) > 0.5
    d_ok = jnp.abs(view.depth - n_view.depth) < 0.1 * jnp.maximum(
        view.depth, 1e-3
    )
    return view.valid & n_view.valid & n_ok & d_ok


def _spatial_reuse(cfg: RenderConfig, view: GBufferView, r_src: dict,
                   rng_state):
    """Spatial rounds (ref direct_stage.comp:224-255 + 86-121): each round
    merges cfg.spatial_neighbors disk-distributed neighbours of the CACHED
    post-temporal reservoirs (r_src — the analog of the reference's
    barrier-separated cacheTempReservoir exchange; both rounds read the same
    cache) into a per-round aggregate; the round aggregates merge into one
    `spatial` reservoir which folds into the pixel's reservoir once at the
    end.  Self-merges are skipped.  Returns (rng_state, merged reservoir).

    Reference quirks NOT replicated: its neighbour pick lands within +-1 px
    (toConcentricDisk output used unscaled despite the declared Radius=30,
    K1:88-91) and its geometric gate compares the centre pixel with itself
    (loadThisGeometryInfo(imageCoords, ...), K1:97) so it always passes; we
    use the declared radius and gate against the actual neighbour."""
    h, w = view.depth.shape
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    spatial = empty_di_reservoir(h, w)
    for _round in range(max(cfg.spatial_rounds, 1)):
        agg = empty_di_reservoir(h, w)
        for _k in range(cfg.spatial_neighbors):
            rng_state, a1 = erng.rand(rng_state)
            rng_state, a2 = erng.rand(rng_state)
            ang = 2.0 * jnp.pi * a1
            rad = cfg.spatial_radius * jnp.sqrt(a2)
            oy = jnp.round(rad * jnp.sin(ang)).astype(jnp.int32)
            ox = jnp.round(rad * jnp.cos(ang)).astype(jnp.int32)
            ny = ys + oy
            nx = xs + ox
            inb = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
            not_self = (oy != 0) | (ox != 0)
            # |oy| <= spatial_radius by construction, so the halo bound is
            # exact here (in-halo mask is all-true for in-bounds taps)
            s_halo = int(np.ceil(cfg.spatial_radius))
            nyc = jnp.clip(ny, 0, h - 1)
            nxc = jnp.clip(nx, 0, w - 1)
            n_view, _ = halo_gather_tree(view, nyc, nxc, s_halo)
            n_resv, _ = halo_gather_tree(r_src, nyc, nxc, s_halo)
            gates = _spatial_gates(view, n_view) & inb & not_self
            rng_state, u = erng.rand(rng_state)
            agg = resv.resv_merge_same_target(agg, n_resv, u, enabled=gates)
        rng_state, u = erng.rand(rng_state)
        spatial = resv.resv_merge_same_target(spatial, agg, u)
    rng_state, u = erng.rand(rng_state)
    merged = resv.resv_merge_same_target(r_src, spatial, u)
    return rng_state, merged
