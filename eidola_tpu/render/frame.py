"""The frame function: one jit-compiled pure step
    state', outputs = render_frame(scene, camera, params, tonemap, state)
replacing the reference's descriptor-set parity ping-pong + seven dispatches
(ref renderer.cpp:154-206 Renderer::run) with a functional carry.

Stage chain per frame (ref README.md:73-77, renderer.cpp:163-205):
  direct stage (G-buffer + ReSTIR DI)            -> K1
  indirect stage (ReSTIR GI, quarter res)        -> K2
  a-trous denoise direct (4 levels)              -> K3
  a-trous denoise indirect (5 levels, half res)  -> K4
  compose (re-modulate albedo, upsample)         -> K5
  accumulation + tonemap/post                    -> K8
XLA orders the stages by tensor dataflow — the reference's missing
inter-dispatch barriers (SURVEY §5.2) are structurally impossible here.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rng as erng
from ..scene.camera import Camera
from ..scene.data import SceneData
from .compose import compose
from .config import (
    DEBUG_BASE_COLOR,
    DEBUG_DEPTH,
    DEBUG_DIRECT,
    DEBUG_EMISSIVE,
    DEBUG_INDIRECT,
    DEBUG_METALLIC,
    DEBUG_NONE,
    DEBUG_NORMAL,
    DEBUG_ROUGHNESS,
    DEBUG_TEXCOORD,
    RenderConfig,
    RenderParams,
    TonemapParams,
)
from .denoise import atrous_denoise
from .direct import DirectOut, direct_stage, empty_di_reservoir
from .gbuffer import GBuffer, GBufferView, empty_gbuffer
from .indirect import IndirectOut, empty_gi_reservoir, indirect_stage
from .post import post_process


class FrameState(NamedTuple):
    """Carried frame-to-frame state (the reference's ping-pong resources,
    renderer.cpp:341-375, as an explicit pytree — trivially checkpointable,
    SURVEY §5.4)."""
    frame_idx: jnp.ndarray   # () i32
    gbuf: GBuffer            # last frame's G-buffer
    di_resv: dict            # last DI reservoirs (H, W)
    di_vis: jnp.ndarray      # (H, W) f32 last winner visibility (-1 unknown;
    #                          drives shadow_cadence visibility reuse)
    gi_resv: dict            # last GI reservoirs (H/2, W/2)
    prev_cam: Camera         # camera that produced gbuf
    accum: jnp.ndarray       # (H, W, 3) progressive accumulation (HDR)
    accum_count: jnp.ndarray  # () f32


def init_frame_state(cfg: RenderConfig, cam: Camera) -> FrameState:
    h, w = cfg.height, cfg.width
    stride = 2 if cfg.indirect_half_res else 1
    return FrameState(
        frame_idx=jnp.asarray(0, jnp.int32),
        gbuf=empty_gbuffer(h, w),
        di_resv=empty_di_reservoir(h, w),
        di_vis=jnp.full((h, w), -1.0, jnp.float32),
        gi_resv=empty_gi_reservoir(h // stride, w // stride),
        prev_cam=cam,
        accum=jnp.zeros((h, w, 3), jnp.float32),
        accum_count=jnp.asarray(0.0, jnp.float32),
    )


def reset_accumulation(state: FrameState) -> FrameState:
    """resetFrame analog (ref sample_example.cpp:178-204)."""
    return state._replace(
        accum=jnp.zeros_like(state.accum),
        accum_count=jnp.zeros_like(state.accum_count),
    )


def _camera_moved(cam: Camera, prev: Camera):
    """Any camera change (view OR projection — a fov/aspect change must also
    reset accumulation, ref sample_example.cpp:178-196 compares the full
    camera state)."""
    return jnp.any(jnp.abs(cam.view - prev.view) > 1e-6) | jnp.any(
        jnp.abs(cam.proj - prev.proj) > 1e-6
    )


def _debug_image(cfg: RenderConfig, out_d: DirectOut, direct_hdr, indirect_hdr):
    """Debug channels (ref DebugMode host_device.h:128-139; DebugInfo
    pathtrace.glsl:362-380, post.frag:106-118)."""
    v = out_d.view
    s = out_d.state
    mode = cfg.debug_mode
    if mode == DEBUG_DIRECT:
        return direct_hdr
    if mode == DEBUG_INDIRECT:
        return indirect_hdr
    if mode == DEBUG_BASE_COLOR:
        return v.albedo
    if mode == DEBUG_NORMAL:
        return v.nrm * 0.5 + 0.5
    if mode == DEBUG_DEPTH:
        d = jnp.clip(v.depth / 10.0, 0.0, 1.0)[..., None]
        return jnp.repeat(d, 3, axis=-1)
    if mode == DEBUG_METALLIC:
        return jnp.repeat(v.metallic[..., None], 3, axis=-1)
    if mode == DEBUG_ROUGHNESS:
        return jnp.repeat(v.roughness[..., None], 3, axis=-1)
    if mode == DEBUG_EMISSIVE:
        return out_d.emission
    if mode == DEBUG_TEXCOORD:
        return jnp.concatenate(
            [s.uv % 1.0, jnp.zeros_like(s.uv[..., :1])], axis=-1
        )
    raise ValueError(f"unknown debug mode {mode}")


def render_frame(
    cfg: RenderConfig,
    scene: SceneData,
    cam: Camera,
    params: RenderParams,
    tm: TonemapParams,
    state: FrameState,
):
    """One full frame.  Pure; jit with cfg static:
        step = jax.jit(render_frame, static_argnums=0)
    Returns (new_state, outputs dict).
    """
    h, w = cfg.height, cfg.width
    stride = 2 if cfg.indirect_half_res else 1
    h2, w2 = h // stride, w // stride

    # camera motion resets progressive accumulation (ref updateFrame,
    # sample_example.cpp:178-196)
    moved = _camera_moved(cam, state.prev_cam)
    accum = jnp.where(moved & jnp.asarray(cfg.accumulate), 0.0, state.accum)
    accum_count = jnp.where(
        moved & jnp.asarray(cfg.accumulate), 0.0, state.accum_count
    )

    salt = params.time_word + state.frame_idx.astype(jnp.uint32)
    rng_full = erng.seed_pixels(h, w, salt)
    rng_half = erng.seed_pixels(h2, w2, salt ^ jnp.uint32(0x8F1BBCDC))

    # ---- direct stage (K1) -------------------------------------------------
    rng_full, out_d = direct_stage(
        cfg, scene, params, cam, state.gbuf, state.di_resv, state.prev_cam,
        rng_full, prev_vis=state.di_vis, frame_idx=state.frame_idx,
    )

    # ---- indirect stage (K2) ----------------------------------------------
    if cfg.indirect_enabled and cfg.max_depth >= 1:
        from .gbuffer import center_rays, decode_gbuffer

        prev_view_full = decode_gbuffer(
            state.gbuf, state.prev_cam.pos, center_rays(state.prev_cam, h, w)
        )
        rng_half, out_i = indirect_stage(
            cfg, scene, params, cam, out_d.view, out_d.motion,
            prev_view_full, state.gi_resv, rng_half, frame_word=salt,
        )
    else:
        out_i = IndirectOut(
            illum_ldr=jnp.zeros((h2, w2, 3), jnp.float32),
            resv=state.gi_resv,
        )

    # ---- denoise (K3/K4) ---------------------------------------------------
    if cfg.denoise:
        direct_ldr = atrous_denoise(
            out_d.illum_ldr, out_d.view, cfg.denoise_direct_levels,
            params.sigma_lum_direct, params.sigma_norm_direct,
            params.sigma_depth_direct,
        )
        view_half = GBufferView(*[a[::stride, ::stride] for a in out_d.view])
        indirect_ldr = atrous_denoise(
            out_i.illum_ldr, view_half, cfg.denoise_indirect_levels,
            params.sigma_lum_indirect, params.sigma_norm_indirect,
            params.sigma_depth_indirect,
        )
    else:
        direct_ldr = out_d.illum_ldr
        indirect_ldr = out_i.illum_ldr

    # ---- compose (K5) ------------------------------------------------------
    hdr = compose(
        direct_ldr,
        indirect_ldr if cfg.indirect_enabled else None,
        out_d.emission,
        out_d.view,
        modulate=cfg.modulate_albedo,
    )

    # ---- progressive accumulation -----------------------------------------
    if cfg.accumulate:
        accum = accum + hdr
        accum_count = accum_count + 1.0
        display_hdr = accum / jnp.maximum(accum_count, 1.0)
    else:
        display_hdr = hdr

    # ---- debug channel override -------------------------------------------
    if cfg.debug_mode != DEBUG_NONE:
        from ..ops.math import ldr_to_hdr

        display_hdr = _debug_image(
            cfg, out_d, ldr_to_hdr(direct_ldr), ldr_to_hdr(
                jnp.repeat(jnp.repeat(indirect_ldr, stride, 0), stride, 1)[:h, :w]
            ),
        )

    # ---- post / tonemap (K8) ----------------------------------------------
    image = post_process(
        display_hdr, tm, frame_word=salt, tonemap_kind=cfg.tonemap_kind
    )

    new_state = FrameState(
        frame_idx=state.frame_idx + 1,
        gbuf=out_d.gbuf,
        di_resv=out_d.resv,
        di_vis=out_d.vis,
        gi_resv=out_i.resv,
        prev_cam=cam,
        accum=accum,
        accum_count=accum_count,
    )
    outputs = {
        "image": image,
        "hdr": display_hdr,
        "direct_ldr": direct_ldr,
        "indirect_ldr": indirect_ldr,
        "motion": out_d.motion,
    }
    return new_state, outputs


@functools.lru_cache(maxsize=64)
def make_step(cfg: RenderConfig):
    """Compiled frame function for a fixed config, MEMOIZED on the (frozen,
    hashable) config: repeated requests for the same config share one jit
    cache entry instead of recompiling (full-pipeline XLA:CPU compiles run
    minutes).  This is also the live-toggle step cache the viewer uses —
    the TPU-native analog of the reference rebuilding pipelines when a
    compile-time switch flips (ref sample_gui.cpp:119-206)."""

    @jax.jit
    def step(scene, cam, params, tm, state):
        return render_frame(cfg, scene, cam, params, tm, state)

    return step
