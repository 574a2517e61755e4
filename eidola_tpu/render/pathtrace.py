"""Shared path-tracing library: environment radiance, alias-table light
sampling, NEE and emitter-hit pdfs (ref shaders/pathtrace.glsl:40-232,
shaders/env_sampling.glsl, shaders/punctual.glsl).

All functions are SoA over lanes; `cfg` only selects static structure
(env mode), never per-lane branches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.alias_table import sample_alias
from ..ops.math import dot3, length, luminance, normalize
from ..scene import hdr as ehdr
from ..scene import sunsky as esky
from ..scene.data import (
    LIGHT_DIRECTIONAL,
    LIGHT_POINT,
    LIGHT_SPOT,
    SceneData,
)
from .config import RenderConfig, RenderParams

_FAR = 1e7


class LightSample(NamedTuple):
    """One NEE candidate (ref host_device.h LightSample).  Contribution =
    li * f * cos / pdf; pdf already includes every selection probability."""
    li: jnp.ndarray    # (..., 3) emitted radiance toward the shading point
    wi: jnp.ndarray    # (..., 3) unit direction to the light
    dist: jnp.ndarray  # (...,) distance for the shadow ray
    pdf: jnp.ndarray   # (...,) solid-angle pdf (or discrete prob for punctual)
    delta: jnp.ndarray  # (...,) bool — delta light (no MIS against BSDF)


# ---------------------------------------------------------------- environment

def env_enabled(cfg: RenderConfig, scene: SceneData):
    """Dynamic 0/1: is there an environment light at all?"""
    if cfg.env_mode == "hdr" and scene.env is not None:
        return jnp.asarray(1.0, jnp.float32)
    return scene.sunsky.enabled.astype(jnp.float32)


def env_selection_prob(cfg: RenderConfig, scene: SceneData, params: RenderParams):
    """Probability that sample_direct_light picks the environment branch."""
    has_any_light = (scene.lights.num_trig + scene.lights.num_punc) > 0
    env_p = jnp.where(has_any_light, params.environment_prob, 1.0)
    return env_p * env_enabled(cfg, scene)


def env_radiance(cfg: RenderConfig, scene: SceneData, params: RenderParams, d):
    """Radiance from the environment along miss direction d
    (ref pathtrace.glsl:40-47)."""
    if cfg.env_mode == "hdr" and scene.env is not None:
        return ehdr.env_eval(scene.env, d, params.hdr_multiplier)
    return esky.sky_radiance(scene.sunsky, d) * env_enabled(cfg, scene)


def env_pdf_dir(cfg: RenderConfig, scene: SceneData, d):
    """Solid-angle pdf of the env light sampler for direction d (for MIS when
    a BSDF ray escapes; ref pathtrace.glsl:49-72)."""
    if cfg.env_mode == "hdr" and scene.env is not None:
        return ehdr.env_pdf(scene.env, d)
    return esky.sun_pdf(scene.sunsky, d)


def sample_env(cfg: RenderConfig, scene: SceneData, params: RenderParams, u1, u2, u3, u4):
    """Draw an env direction.  Returns (wi, pdf, li)
    (ref env_sampling.glsl:38-135)."""
    if cfg.env_mode == "hdr" and scene.env is not None:
        return ehdr.env_sample(scene.env, u1, u2, u3, u4, params.hdr_multiplier)
    wi, pdf, li = esky.sample_sun(scene.sunsky, u1, u2)
    return wi, pdf, li * env_enabled(cfg, scene)


# --------------------------------------------------------------- area lights

def sample_triangle_light(scene: SceneData, pos, u1, u2, u3, u4):
    """Alias-table triangle-light sample (ref pathtrace.glsl:103-139).

    Returns (wi, dist, pdf_solid_angle, li)."""
    lights = scene.lights
    idx, pmf = sample_alias(lights.trig_table, u1, u2)
    v0 = lights.trig_v0[idx]
    v1 = lights.trig_v1[idx]
    v2 = lights.trig_v2[idx]
    # uniform point on triangle (sqrt warp, ref pathtrace.glsl:90-101)
    su = jnp.sqrt(jnp.maximum(u3, 0.0))
    b1 = 1.0 - su
    b2 = u4 * su
    p = v0 * (1.0 - b1 - b2)[..., None] + v1 * b1[..., None] + v2 * b2[..., None]

    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    area2 = length(n)
    area = 0.5 * area2
    n = n / jnp.maximum(area2, 1e-20)[..., None]

    to_l = p - pos
    dist = jnp.maximum(length(to_l), 1e-6)
    wi = to_l / dist[..., None]
    cos_l = jnp.abs(dot3(n, -wi))  # double-sided emitters
    # area pdf (pmf / area) -> solid angle (ref LightEval, pathtrace.glsl:74-88)
    pdf = pmf * dist * dist / jnp.maximum(area * cos_l, 1e-9)
    li = lights.trig_emission[idx]
    ok = (cos_l > 1e-6) & (area > 1e-12) & (scene.lights.num_trig > 0)
    return wi, dist, jnp.where(ok, pdf, 0.0), jnp.where(ok[..., None], li, 0.0)


# ------------------------------------------------------------ punctual lights

def sample_punctual(scene: SceneData, pos, u1, u2):
    """Alias-table punctual light sample (ref pathtrace.glsl:141-159;
    attenuation per KHR_lights_punctual, ref punctual.glsl:28-51).

    Returns (wi, dist, pmf, li) — pmf is a discrete probability (delta light).
    """
    lights = scene.lights
    idx, pmf = sample_alias(lights.punc_table, u1, u2)
    lpos = lights.punc_pos[idx]
    lcol = lights.punc_color[idx]
    ltype = lights.punc_type[idx]
    ldir = normalize(lights.punc_dir[idx])
    lrange = lights.punc_range[idx]

    to_l = lpos - pos
    dist_p = jnp.maximum(length(to_l), 1e-6)
    wi_p = to_l / dist_p[..., None]

    directional = ltype == LIGHT_DIRECTIONAL
    wi = jnp.where(directional[..., None], -ldir, wi_p)
    dist = jnp.where(directional, _FAR, dist_p)

    # inverse-square with smooth range cutoff
    atten = 1.0 / (dist_p * dist_p)
    rng_t = jnp.where(lrange > 0.0, jnp.clip(dist_p / jnp.maximum(lrange, 1e-6), 0.0, 1.0), 0.0)
    atten = atten * jnp.clip(1.0 - rng_t ** 4, 0.0, 1.0)
    atten = jnp.where(directional, 1.0, atten)

    # spot cone falloff
    cd = dot3(-wi, ldir)
    spot_t = jnp.clip(
        (cd - lights.punc_cos_outer[idx])
        / jnp.maximum(lights.punc_cos_inner[idx] - lights.punc_cos_outer[idx], 1e-4),
        0.0,
        1.0,
    )
    spot = spot_t * spot_t * (3.0 - 2.0 * spot_t)
    atten = jnp.where(ltype == LIGHT_SPOT, atten * spot, atten)

    li = lcol * atten[..., None]
    ok = scene.lights.num_punc > 0
    return wi, dist, jnp.where(ok, pmf, 0.0), jnp.where(ok, li, jnp.zeros_like(li))


# ------------------------------------------------------- combined NEE sampler

def sample_direct_light(
    cfg: RenderConfig,
    scene: SceneData,
    params: RenderParams,
    pos,
    rng_state,
):
    """Three-way light selection env / triangle / punctual by environment_prob
    and trig_samp_prob (ref pathtrace.glsl:161-183).  No visibility test —
    callers either RIS-weigh candidates (direct stage) or shoot the shadow ray
    themselves.

    Returns (rng_state, LightSample)."""
    from ..ops import rng as erng

    rng_state, r_sel = erng.rand(rng_state)
    rng_state, u1 = erng.rand(rng_state)
    rng_state, u2 = erng.rand(rng_state)
    rng_state, u3 = erng.rand(rng_state)
    rng_state, u4 = erng.rand(rng_state)

    env_p = env_selection_prob(cfg, scene, params)
    trig_p = scene.lights.trig_samp_prob

    pick_env = r_sel < env_p
    # renormalize the selector for the non-env branch
    r2 = jnp.clip((r_sel - env_p) / jnp.maximum(1.0 - env_p, 1e-6), 0.0, 1.0)
    pick_trig = (~pick_env) & (r2 < trig_p)
    pick_punc = (~pick_env) & (~pick_trig)

    e_wi, e_pdf, e_li = sample_env(cfg, scene, params, u1, u2, u3, u4)
    t_wi, t_dist, t_pdf, t_li = sample_triangle_light(scene, pos, u1, u2, u3, u4)
    p_wi, p_dist, p_pmf, p_li = sample_punctual(scene, pos, u1, u2)

    wi = jnp.where(
        pick_env[..., None], e_wi, jnp.where(pick_trig[..., None], t_wi, p_wi)
    )
    dist = jnp.where(pick_env, _FAR, jnp.where(pick_trig, t_dist, p_dist))
    li = jnp.where(
        pick_env[..., None], e_li, jnp.where(pick_trig[..., None], t_li, p_li)
    )
    pdf = jnp.where(
        pick_env,
        e_pdf * env_p,
        jnp.where(
            pick_trig,
            t_pdf * (1.0 - env_p) * trig_p,
            p_pmf * (1.0 - env_p) * jnp.maximum(1.0 - trig_p, 1e-6),
        ),
    )
    # sun-disk sampling in sunsky mode is near-delta but has a real solid
    # angle, so only punctual picks are flagged delta
    return rng_state, LightSample(li=li, wi=wi, dist=dist, pdf=pdf, delta=pick_punc)


def light_pdf_for_bsdf_dir(
    cfg: RenderConfig,
    scene: SceneData,
    params: RenderParams,
    d,
    hit_tri,
    hit_dist,
    hit_cos,
):
    """pdf of sample_direct_light producing direction d — the light half of
    the MIS weight for BSDF-sampled rays (ref indirect_stage.comp:143-216).

    hit_tri: i32 (-1 = escaped to env); hit_dist / hit_cos describe the
    emitter hit when hit_tri >= 0.
    """
    env_p = env_selection_prob(cfg, scene, params)
    trig_p = scene.lights.trig_samp_prob

    escaped = hit_tri < 0
    pdf_env = env_pdf_dir(cfg, scene, d) * env_p

    from ..scene.data import shade_row

    tid, inst_id = shade_row(scene, jnp.maximum(hit_tri, 0))
    pmf = scene.tri_light_pmf[tid]
    area = scene.tri_light_area[tid]
    if inst_id is not None:
        # instanced pools store the unnormalized mesh weight / object area
        pmf = pmf * scene.inst.pmf_scale[inst_id]
        area = area * scene.inst.area_scale[inst_id]
    pdf_trig = (
        pmf
        * hit_dist
        * hit_dist
        / jnp.maximum(area * jnp.abs(hit_cos), 1e-9)
        * (1.0 - env_p)
        * trig_p
    )
    pdf_trig = jnp.where((pmf > 0) & ~escaped, pdf_trig, 0.0)
    return jnp.where(escaped, pdf_env, pdf_trig)


def p_hat(ls: LightSample, f, cos_i):
    """ReSTIR target function: luminance of the unshadowed contribution
    (ref direct_stage.comp RIS loop)."""
    return luminance(ls.li * f) * jnp.maximum(cos_i, 0.0)
