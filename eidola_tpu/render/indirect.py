"""ReSTIR GI indirect stage at quarter pixel count
(ref shaders/indirect_stage.comp:129-309; G-buffer reconstruction ref
pathtrace.glsl:296-360).

Per half-res pixel:
  reconstruct the primary surface from the full-res G-buffer at coord*2
  tiled multi-bounce: a per-8x8-tile coin decides whether the continuation
  path traces max_depth bounces (contribution x 1/p compensated) or stops at
  one bounce                                           [K2:39-45, 283-288]
  GI sample: BSDF-sample a first bounce direction from the surface, trace it,
  collect radiance L arriving from the hit xs (NEE at xs + MIS-weighted
  deeper emitter/env hits; the depth-1 segment itself contributes zero —
  DI's NEE at the primary vertex covers it, ref K2:180-216 depth==1)
  ReSTIR GI reservoir: candidate weight pHat/p1 with pHat = luminance(L)
  (pixel-independent target so temporal merges stay same-target), temporal
  fetch via the motion vector at coord*2, M-clamp      [K2:228-252]
  shade: L * f(xv, xv->xs) * cos * W, firefly clamp, HDR->LDR  [K2:255-264]

TPU note: the tiled RR currently keeps all lanes resident and masks short
tiles (identical estimator); physical compaction of long tiles is a planned
optimization (SURVEY §5.7).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import reservoir as resv
from ..ops import rng as erng

from ..ops.math import (
    clamp_radiance,
    hdr_to_ldr,
    luminance,
    make_frame,
    normalize,
    offset_ray,
    to_local,
    to_world,
)
from ..scene.camera import Camera
from ..scene.data import SceneData
from .bsdf import BsdfParams, eval_bsdf, sample_bsdf
from .config import RESTIR_NONE, RESTIR_RIS, RenderConfig, RenderParams
from .gbuffer import GBuffer, GBufferView
from .shade_state import State, get_state
from .tracer import trace_closest, trace_radiance
from ..ops.halo import halo_gather_tree
from .direct import _temporal_gates

_TMIN = 1e-4
_TMAX = 1e8
_ENV_DIST = 1e6


class IndirectOut(NamedTuple):
    illum_ldr: jnp.ndarray  # (h2, w2, 3) demodulated indirect illumination (LDR)
    resv: dict              # GI reservoirs to carry


def empty_gi_reservoir(h2: int, w2: int) -> dict:
    sample = {
        "xs": jnp.zeros((h2, w2, 3), jnp.float32),
        "ns": jnp.zeros((h2, w2, 3), jnp.float32),
        "l": jnp.zeros((h2, w2, 3), jnp.float32),
    }
    return resv.make_reservoir(sample, (h2, w2))


def _surface_from_view(view: GBufferView, cam: Camera) -> State:
    """Rebuild a shading State from the decoded G-buffer (demodulated:
    albedo=1; ref pathtrace.glsl:296-360 getIndirectStateFromGBuffer)."""
    ones3 = jnp.ones(view.pos.shape, jnp.float32)
    return State(
        pos=view.pos,
        nrm=view.nrm,
        geo_nrm=view.nrm,
        uv=jnp.zeros(view.pos.shape[:-1] + (2,), jnp.float32),
        albedo=ones3,
        opacity=jnp.ones_like(view.depth),
        metallic=view.metallic,
        roughness=view.roughness,
        ior=view.ior,
        transmission=view.transmission,
        emission=jnp.zeros_like(ones3),
        mat_id=view.mat_hash.astype(jnp.int32),
        valid=view.valid,
    )


def _long_tile_lanes(cfg: RenderConfig, frame_word, h2: int, w2: int):
    """Pick EXACTLY round(p * n_tiles) tiles per frame to trace deep bounces
    (ref indirect_stage.comp:283-288 flips one coin per 8x8 workgroup; we
    select an exact count so the deep continuation can run on a STATICALLY
    quarter-sized compacted lane set — masked lanes are not free on a
    static-shape machine, compaction is).

    Returns (flat lane indices (k_long*ts*ts,) with out-of-image lanes set
    to the out-of-bounds sentinel h2*w2, inverse scale n_tiles / k_long).
    Each tile's inclusion probability is k/n, so scaling the deep term by
    n/k stays unbiased."""
    ts = cfg.multibounce_tile
    th = (h2 + ts - 1) // ts
    tw = (w2 + ts - 1) // ts
    n_tiles = th * tw
    k_long = max(1, int(round(cfg.multibounce_prob * n_tiles)))

    # frame_word changes EVERY frame (time_word + frame_idx, frame.py) so a
    # fresh tile set traces deep bounces each frame and temporal accumulation
    # averages out the tile pattern (ref indirect_stage.comp:283-288 reseeds
    # the per-workgroup coin with rtxState.time).
    tid = jnp.arange(n_tiles, dtype=jnp.uint32)
    salt = jnp.broadcast_to(
        jnp.asarray(frame_word, jnp.uint32) + jnp.uint32(0x9E37), (n_tiles,)
    )
    key = erng.pcg2d(jnp.stack([tid * jnp.uint32(7919), salt], -1))[..., 0]
    order = jnp.argsort(key)             # random permutation of tiles
    long_ids = order[:k_long].astype(jnp.int32)

    ty = long_ids // tw
    tx = long_ids % tw
    dy = jnp.arange(ts, dtype=jnp.int32)
    dx = jnp.arange(ts, dtype=jnp.int32)
    rows = ty[:, None, None] * ts + dy[None, :, None]
    cols = tx[:, None, None] * ts + dx[None, None, :]
    inside = (rows < h2) & (cols < w2)
    flat = jnp.where(inside, rows * w2 + cols, h2 * w2).reshape(-1)
    return flat, float(n_tiles) / float(k_long)


def indirect_stage(
    cfg: RenderConfig,
    scene: SceneData,
    params: RenderParams,
    cam: Camera,
    view_full: GBufferView,
    motion_full: jnp.ndarray,
    prev_view_full: GBufferView,
    prev_resv: dict,
    rng_state,
    frame_word=None,
) -> tuple[jnp.ndarray, IndirectOut]:
    """rng_state: (h2, w2) u32 stream for the half-res lanes.
    frame_word: u32 scalar that changes every frame (salts the deep-tile
    pick; defaults to a constant only for standalone/unit use)."""
    if frame_word is None:
        frame_word = jnp.uint32(0)
    stride = 2 if cfg.indirect_half_res else 1
    h2 = cfg.height // stride
    w2 = cfg.width // stride
    R = h2 * w2

    # --- reconstruct primary surface at coord*stride ------------- K2:292
    def sub(a):
        return a[::stride, ::stride]

    view = GBufferView(*[sub(a) for a in view_full])
    surf = _surface_from_view(view, cam)
    wo = normalize(jnp.broadcast_to(cam.pos, surf.pos.shape) - surf.pos)

    # --- first bounce direction (BSDF sample at xv) -------------- K2:155-161
    rng_state, u1 = erng.rand(rng_state)
    rng_state, u2 = erng.rand(rng_state)
    rng_state, u3 = erng.rand(rng_state)
    bp = BsdfParams(albedo=view.albedo, metallic=surf.metallic, roughness=surf.roughness)
    t, b = make_frame(surf.nrm)
    wo_l = to_local(t, b, surf.nrm, wo)
    wi_l, p1, _f1 = sample_bsdf(bp, wo_l, u1, u2, u3)
    d1 = to_world(t, b, surf.nrm, wi_l)
    gen_ok = surf.valid & (p1 > 1e-9) & (wi_l[..., 2] > 0.0)

    origin = offset_ray(surf.pos, surf.nrm)
    # BSDF-sampled directions are incoherent: sorted wavefront traversal
    rng_state, rec = trace_closest(
        cfg, scene, origin, d1,
        jnp.full((h2, w2), _TMIN), jnp.where(gen_ok, _TMAX, -1.0),
        rng_state,
    )
    tri1 = rec.tri
    # widened ray cone for the half-res GI fetches
    cone = (
        (2.0 * stride * cam.proj_inv[1, 1] / cfg.height)
        if cfg.texture_mips else None
    )
    xs_state = get_state(scene, origin, d1, tri1, rec.t, rec.u, rec.v,
                         cone_angle=cone)
    hit1 = xs_state.valid & gen_ok

    # The depth-1 segment contributes NO radiance: if the BSDF ray hits an
    # emitter or escapes to the environment, the reference records xs/ns but
    # leaves L = 0, because ReSTIR DI's NEE at the primary vertex already
    # covers direct light (ref indirect_stage.comp:180-216, depth==1
    # branches).  Adding it here at weight 1 would double-count emitters/env
    # against the direct stage.  L accumulates only the continuation: NEE at
    # xs and MIS-weighted emitter/env hits from depth>=2 segments.
    L = jnp.zeros(xs_state.pos.shape, jnp.float32)

    # --- continuation with tiled multi-bounce -------------------- K2:129-226
    if cfg.max_depth > 1:
        if cfg.tiled_multibounce and cfg.max_depth > 2:
            # Tiled multi-bounce: every lane gets the 1-bounce continuation
            # (NEE at xs + one more segment); ONLY the lanes of the selected
            # long tiles (exactly p of all tiles) trace the deep bounces, on
            # a compacted quarter-sized ray set — masked lanes are not free
            # on a static-shape machine, compaction is.  The deep trace
            # snapshots its own 1-bounce prefix so (L_sub_c - L_one_c)
            # isolates the deep contribution, scattered back with the 1/p
            # compensation (ref indirect_stage.comp:39-45, 133, 283-288).
            rng_state, L_one_all, _ = trace_radiance(
                cfg, scene, params, None, None, rng_state,
                num_bounces=1, start_state=xs_state, start_wo=-d1,
                nee_start_depth=0,
            )
            flat, inv_p = _long_tile_lanes(cfg, frame_word, h2, w2)

            def g(a):
                return a.reshape((h2 * w2,) + a.shape[2:])[
                    jnp.minimum(flat, h2 * w2 - 1)
                ]

            xs_c = State(*[g(f) for f in xs_state])
            rng_c = erng.pcg(g(rng_state) ^ jnp.uint32(0xB5297A4D))
            d1_c = g(d1)
            _, L_sub_c, _, L_one_c = trace_radiance(
                cfg, scene, params, None, None, rng_c,
                num_bounces=cfg.max_depth - 1,
                start_state=xs_c, start_wo=-d1_c,
                nee_start_depth=0,
                snapshot_after_depth=1,
            )
            deep = (L_sub_c - L_one_c) * inv_p
            deep_full = (
                jnp.zeros((h2 * w2 + 1, 3), jnp.float32)
                .at[flat].add(deep, mode="drop")[: h2 * w2]
                .reshape(h2, w2, 3)
            )
            L_cont = L_one_all + deep_full
        else:
            rng_state, L_sub, _ = trace_radiance(
                cfg, scene, params, None, None, rng_state,
                num_bounces=cfg.max_depth - 1,
                start_state=xs_state,
                start_wo=-d1,
                nee_start_depth=0,
            )
            L_cont = L_sub
        L = L + jnp.where(hit1[..., None], L_cont, 0.0)

    xs = jnp.where(
        hit1[..., None], xs_state.pos, origin + d1 * _ENV_DIST
    )
    ns = jnp.where(hit1[..., None], xs_state.nrm, -d1)

    # --- ReSTIR GI reservoir ------------------------------------- K2:228-252
    use_restir = cfg.restir_mode not in (RESTIR_NONE, RESTIR_RIS)
    p_hat_new = luminance(L)
    w_new = jnp.where(gen_ok & (p1 > 1e-9), p_hat_new / jnp.maximum(p1, 1e-9), 0.0)
    r = empty_gi_reservoir(h2, w2)
    rng_state, u = erng.rand(rng_state)
    r = resv.resv_update(r, {"xs": xs, "ns": ns, "l": L}, w_new, u)

    if use_restir:
        # temporal fetch via motion vector at coord*stride ------- K2:234-238
        motion = motion_full[::stride, ::stride]
        m_ok = motion[..., 0] >= 0
        hist_y2 = jnp.clip(motion[..., 0] // stride, 0, h2 - 1)
        hist_x2 = jnp.clip(motion[..., 1] // stride, 0, w2 - 1)
        hist_resv, r_halo = halo_gather_tree(
            prev_resv, hist_y2, hist_x2, max(cfg.temporal_halo // stride, 1)
        )
        # geometric gates vs the history G-buffer at the full-res coord
        hy = jnp.clip(motion[..., 0], 0, cfg.height - 1)
        hx = jnp.clip(motion[..., 1], 0, cfg.width - 1)
        hist_view, v_halo = halo_gather_tree(
            prev_view_full, hy, hx, cfg.temporal_halo, stride=stride
        )
        gates = _temporal_gates(view, hist_view) & m_ok & r_halo & v_halo
        rng_state, u = erng.rand(rng_state)
        r = resv.resv_merge_same_target(r, hist_resv, u, enabled=gates)
        r = resv.resv_clamp(r, 2.0 * params.reservoir_clamp)
    r = resv.resv_check(r)

    # --- shade ---------------------------------------------------- K2:255-264
    sel = r["sample"]
    dir_s = normalize(sel["xs"] - surf.pos)
    wi_sel = to_local(t, b, surf.nrm, dir_s)
    f = eval_bsdf(
        BsdfParams(albedo=jnp.ones_like(view.albedo), metallic=surf.metallic,
                   roughness=surf.roughness),
        wo_l, wi_sel,
    )
    cos_i = jnp.maximum(wi_sel[..., 2], 0.0)
    p_hat_sel = luminance(sel["l"])
    big_w = resv.resv_big_w(r, p_hat_sel)
    illum = sel["l"] * f * (cos_i * big_w)[..., None]
    illum = jnp.where(surf.valid[..., None], illum, 0.0)
    illum = clamp_radiance(illum, params.firefly_clamp)
    return rng_state, IndirectOut(illum_ldr=hdr_to_ldr(illum), resv=r)


