"""Runtime configuration, mirroring the reference's static-#define vs
push-constant split (SURVEY §5.6).

- `RenderConfig` (frozen dataclass, hashable) = compile-time switches: things
  that change kernel structure (resolution, max depth, ReSTIR mode, denoise
  level counts, debug channel).  Changing one triggers a re-jit, exactly like
  the reference's #defines / pipeline rebuilds (ref host_device.h:27-29).
- `RenderParams` (NamedTuple of jnp scalars) = per-frame dynamic scalars: the
  analog of the RtxState push constant (ref host_device.h:207-238) plus the
  Tonemapper push constant (ref host_device.h:336-351).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

# DebugMode channels (ref host_device.h:128-139)
DEBUG_NONE = 0
DEBUG_DIRECT = 1
DEBUG_INDIRECT = 2
DEBUG_BASE_COLOR = 3
DEBUG_NORMAL = 4
DEBUG_DEPTH = 5
DEBUG_METALLIC = 6
DEBUG_EMISSIVE = 7
DEBUG_ROUGHNESS = 8
DEBUG_TEXCOORD = 9

# ReSTIR modes (ref host_device.h:142-148)
RESTIR_NONE = 0
RESTIR_RIS = 1
RESTIR_SPATIAL = 2
RESTIR_TEMPORAL = 3
RESTIR_SPATIOTEMPORAL = 4


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (recompile-on-change) renderer configuration."""
    width: int = 512
    height: int = 512
    max_depth: int = 4              # ref sample_example.hpp maxDepth=4
    ris_sample_num: int = 4         # RIS M (ref README.md:109: M=4)
    restir_mode: int = RESTIR_TEMPORAL
    spatial_rounds: int = 0         # final reference build: no spatial (README.md:145)
    spatial_neighbors: int = 5      # disk-distributed neighbours per round (K1:86-121)
    spatial_radius: float = 30.0    # neighbour disk radius in px (K1:88 Radius)
    temporal_halo: int = 64         # max reprojection row displacement kept
                                    # by temporal reuse (ops/halo.py: bounds
                                    # multi-chip traffic to a 2·halo-row
                                    # exchange; beyond = history rejected,
                                    # like a failed gate — unbiased)
    denoise: bool = True
    denoise_direct_levels: int = 4  # ref renderer.cpp:181
    denoise_indirect_levels: int = 5  # ref renderer.cpp:194
    tiled_multibounce: bool = True  # ref indirect_stage.comp:34 TILED_MULTIBOUNCE
    multibounce_tile: int = 8       # workgroup tile edge (host_device.h:31-32)
    multibounce_prob: float = 0.25  # 25% of tiles trace long paths (K2:39-45)
    russian_roulette: bool = True   # ref pathtrace.glsl RR
    rr_depth: int = 1               # depth after which RR kicks in
    use_mis: bool = True
    use_nee: bool = True            # False = pure BSDF-sampling estimator
                                    # (ablation/oracle mode, SURVEY §4)
    indirect_half_res: bool = True  # quarter-pixel-count GI field (renderer.cpp:174)
    indirect_enabled: bool = True
    env_mode: str = "sunsky"        # "sunsky" | "hdr"
    debug_mode: int = DEBUG_NONE
    accumulate: bool = True         # progressive accumulation when camera still
    modulate_albedo: bool = True    # demodulate/remodulate around denoise (K5)
    traversal_max_steps: int = 8192
    # alpha-tested geometry (ref traceray_rq.glsl:32-102 HitTest): when the
    # scene has MASK/BLEND materials, rays re-trace past transparent hits up
    # to alpha_hops times.  Static so opaque scenes pay nothing.
    alpha_geometry: bool = False
    alpha_hops: int = 4
    # ray-cone mip filtering of textures (level from hit distance x pixel
    # angle; the reference builds mip chains but shades at lod 0)
    texture_mips: bool = True
    # primary-ray t_max seeding: re-test the triangle this pixel hit LAST
    # frame (gbuf.tri) against the new primary ray; a hit is a real
    # intersection, so its t is a valid upper bound — the walk prunes
    # everything behind it from step 0.  Exact (the closest hit is <= any
    # seed); instanced scenes re-test in instance object space; with
    # alpha geometry only OPAQUE predicted hits seed (an alpha hit could
    # be HitTest-discarded, so its t must not bound the re-trace).
    # Measured: -33%/-49% primary leaf events (PERF_NOTES primary_seed).
    primary_seed: bool = False
    # DI shadow-ray visibility reuse cadence: 1 = validate the RIS winner
    # with a shadow ray every frame (reference behavior,
    # direct_stage.comp:200-207); N > 1 = only ~1/N of 8x16 ray-packet
    # tiles re-validate per frame, the rest reuse the reprojected
    # visibility of their last validated winner (ReSTIR "visibility
    # reuse": a bias-vs-speed knob — the bias is bounded by the cadence
    # and gated by the same normal/depth/matHash reprojection tests as
    # temporal reuse).  Disocclusions and unknown-visibility pixels always
    # re-validate.
    shadow_cadence: int = 1
    # tonemap operator: 0 = Uncharted2, 1 = HejlRichard, 2 = ACES
    # (ref tonemapping.glsl; selected at post.frag:29)
    tonemap_kind: int = 0

    @property
    def half_width(self) -> int:
        return max(self.width // 2, 1)

    @property
    def half_height(self) -> int:
        return max(self.height // 2, 1)


class RenderParams(NamedTuple):
    """Dynamic per-frame scalars (RtxState push-constant analog,
    ref host_device.h:207-238).  All fields are jnp scalars so updating them
    does NOT recompile.  (The reference's rtxState.frame accumulation index
    lives in FrameState.frame_idx — the carry — not here.)"""
    time_word: jnp.ndarray          # u32 RNG salt (ms since load in reference)
    firefly_clamp: jnp.ndarray      # f32 (4x env integral, sample_example.cpp:97-106)
    hdr_multiplier: jnp.ndarray     # f32
    environment_prob: jnp.ndarray   # f32 chance to sample env light (default .25)
    reservoir_clamp: jnp.ndarray    # f32 temporal M-clamp multiplier (~20; M*clamp=80)
    # NOTE: the reference's envMapLuminIntegInv / lightLuminIntegInv push
    # constants (host_device.h:225-226) have no analog here BY DESIGN:
    # env_pdf (scene/hdr.py) bakes the luminance normalization into the
    # alias table's pdf column, so the per-sample multiply disappears.
    # denoiser edge-stopping sigmas (ref RtxState: 6 sigmas, sample_gui.cpp:176-203)
    sigma_lum_direct: jnp.ndarray
    sigma_norm_direct: jnp.ndarray
    sigma_depth_direct: jnp.ndarray
    sigma_lum_indirect: jnp.ndarray
    sigma_norm_indirect: jnp.ndarray
    sigma_depth_indirect: jnp.ndarray


def default_params(time_word: int = 0) -> RenderParams:
    """Defaults mirroring sample_example.hpp:154-184."""
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return RenderParams(
        time_word=jnp.asarray(time_word, jnp.uint32),
        firefly_clamp=f32(80.0),
        hdr_multiplier=f32(1.0),
        environment_prob=f32(0.25),
        reservoir_clamp=f32(20.0),
        sigma_lum_direct=f32(4.0),
        sigma_norm_direct=f32(128.0),
        sigma_depth_direct=f32(2.0),
        sigma_lum_indirect=f32(4.0),
        sigma_norm_indirect=f32(128.0),
        sigma_depth_indirect=f32(2.0),
    )


class TonemapParams(NamedTuple):
    """Tonemapper push constant analog (ref host_device.h:336-351,
    defaults render_output.hpp:44-55)."""
    brightness: jnp.ndarray
    contrast: jnp.ndarray
    saturation: jnp.ndarray
    vignette: jnp.ndarray
    avg_lum: jnp.ndarray
    zoom: jnp.ndarray
    auto_exposure: jnp.ndarray      # i32 bitfield: 1 = auto key, 2 = local
    exposure: jnp.ndarray
    dither: jnp.ndarray             # i32 0/1
    y_white: jnp.ndarray            # f32 burning white (ref Tonemapper)
    key: jnp.ndarray                # f32 log-average key


def default_tonemap() -> TonemapParams:
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return TonemapParams(
        brightness=f32(1.0),
        contrast=f32(1.0),
        saturation=f32(1.0),
        vignette=f32(0.0),
        avg_lum=f32(1.0),
        zoom=f32(1.0),
        auto_exposure=jnp.asarray(0, jnp.int32),
        exposure=f32(1.0),
        dither=jnp.asarray(1, jnp.int32),
        y_white=f32(0.5),
        key=f32(0.5),
    )
